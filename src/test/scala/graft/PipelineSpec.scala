package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CacheBridge

import graft.operators.{Dedup, Pipeline, Sampling}

/** The declarative runner's contract: the composed flag-based run is
  * row-for-row identical to executing the same stages one-by-one with
  * hard filters, the manifest's survivor counts are those stages'
  * exact counts, and the pin discipline leaves no cache residue.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // ~40 docs exercising every stage: a short doc (len band), a junk
  // source whose mean length fails the gate, exact duplicate pairs,
  // near-duplicate pairs (one-token edits at w=3 shingles), two
  // languages for the stratified stage, and a NULL source / NULL lang
  private def fixture: DataFrame = {
    val base = (1L to 30L).map { i =>
      (i, s"unique document number $i with body token$i alpha beta " +
        s"gamma delta epsilon zeta eta theta iota kappa",
        if (i % 3 == 0) "en" else "de",
        if (i % 5 == 0) "siteB" else "siteA")
    }
    val extras = Seq(
      (31L, "tiny", "en", "siteA"),                       // < 20 chars
      (32L, "unique document number 7 with body token7 alpha beta " +
        "gamma delta epsilon zeta eta theta iota kappa", "en",
        "siteA"),                                          // exact dup of 7
      (33L, "unique document number 8 with body token8 alpha beta " +
        "gamma delta epsilon zeta eta theta iota kappa", "de",
        "siteA"),                                          // exact dup of 8
      (34L, "unique document number 9 with body token9 alpha beta " +
        "gamma delta epsilon zeta eta theta iota KAPPA-edit", "en",
        "siteA"),                                          // near dup of 9
      (35L, "unique document number 12 with body token12 alpha beta " +
        "gamma delta epsilon zeta eta theta iota KAPPA-edit", "de",
        "siteA"),                                          // near dup of 12
      (36L, "junk", "en", "junksite"),                     // short + junk
      (37L, "junk junk junk junk junk junk", "en", "junksite"),
      (38L, "some english text kept alpha beta gamma delta epsilon " +
        "zeta eta theta one two", null, "siteA"),          // null lang
      (39L, "another doc alpha beta gamma delta epsilon zeta eta " +
        "theta three four five", "en", null))              // null source
    (base ++ extras).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private val stages = Seq(
    Pipeline.RowFilter("n_chars BETWEEN 20 AND 8000", "len_band"),
    Pipeline.SourceFilter("source", "n_chars", minMean = 50.0),
    Pipeline.ExactDedup("text"),
    Pipeline.NearDedup("text", threshold = 0.5, shingleWidth = 3),
    Pipeline.StratifiedSample("lang", Map("en" -> 500000L),
      defaultPpm = 1000000L))

  /** The same stages, run the obvious way: hard filter after hard
    * filter, each stage's parameters derived from its actual input.
    */
  private def sequential(docs: DataFrame): Seq[DataFrame] = {
    val s0 = docs.where(coalesce(
      expr("n_chars BETWEEN 20 AND 8000"), lit(false)))
    val good = s0.groupBy("source").agg(avg("n_chars").as("m"))
      .where(col("m") >= 50.0).select("source")
    val s1 = s0.join(good, Seq("source"), "left_semi")
    val fp = Dedup.exact(s1, "doc_id", "text")
    val s2 = s1.join(fp.where(col("doc_id") === col("keeper"))
      .select("doc_id"), Seq("doc_id"), "left_semi")
    val pairs = Dedup.jaccardJoin(s2.select("doc_id", "text"),
      "doc_id", "text", threshold = 0.5)
    val s3 = s2.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    pairs.unpersist(blocking = false)
    val s4 = s3.where(Sampling.stratifiedKeep(col("doc_id"),
      col("lang"), Map("en" -> 500000L), defaultPpm = 1000000L))
    Seq(s0, s1, s2, s3, s4)
  }

  private def rowsOf(df: DataFrame) =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, Option[String], Option[String], Long)]
      .collect().toSet

  test("Pipeline.run == stage-by-stage, manifest counts exact, " +
      "no cache residue") {
    val docs = fixture
    spark.catalog.clearCache()
    val r = Pipeline.run(docs, "doc_id", stages)
    val got = rowsOf(r.rows)
    val manifest = r.manifest.orderBy("stage_ix")
      .as[(Int, String, Long, Long)].collect().toSeq
    val seqStages = sequential(docs)
    val seqCounts = seqStages.map(_.count())
    val want = rowsOf(seqStages.last)
    assert(got == want,
      s"missing=${(want -- got).map(_._1)} spurious=${(got -- want).map(_._1)}")
    assert(want.nonEmpty && got.size < docs.count(),
      "degenerate fixture: nothing filtered or nothing kept")
    // every stage must have real work in this fixture
    val outs = manifest.map(_._4)
    assert(manifest.map(_._3) ==
      (docs.count() +: outs.dropRight(1)), s"rows_in chain: $manifest")
    assert(outs == seqCounts, s"manifest $outs vs sequential $seqCounts")
    assert(outs.zip(docs.count() +: outs.dropRight(1))
      .forall { case (out, in) => out < in },
      s"a stage dropped nothing — fixture too weak: $manifest")
    assert(manifest.map(_._2) == Seq("len_band", "source_filter",
      "exact_dedup", "near_dedup", "stratified_sample"))
    r.release()
    spark.catalog.clearCache()
  }

  test("Pipeline.run pin discipline: answer reusable, release leaves " +
      "the cache empty; pinsOut transfers ownership") {
    val docs = fixture
    spark.catalog.clearCache()
    assert(CacheBridge.isEmpty(spark))
    val r = Pipeline.run(docs, "doc_id", stages)
    val n1 = r.rows.count()
    val n2 = r.rows.count() // second consumer reuses the pinned frame
    assert(n1 == n2 && n1 > 0)
    r.release()
    assert(CacheBridge.isEmpty(spark),
      "eager path left pinned intermediates behind")
    // lazy path: pins land in the caller's buffer, results identical
    val pins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val lazyR = Pipeline.run(docs, "doc_id", stages,
      pinsOut = Some(pins))
    val lazyRows = rowsOf(lazyR.rows) // the caller's ONE action
    assert(pins.nonEmpty, "ownership not transferred")
    assert(lazyRows == rowsOf(r.rows))
    assert(lazyR.manifest.orderBy("stage_ix")
      .as[(Int, String, Long, Long)].collect().toSeq ==
      r.manifest.orderBy("stage_ix")
        .as[(Int, String, Long, Long)].collect().toSeq)
    pins.foreach(_.unpersist(blocking = true))
    assert(CacheBridge.isEmpty(spark),
      "lazy path left pins the caller's buffer did not own")
  }
}
