package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 semantics on a corpus where the ranking is known by hand. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: tf raises, length normalizes, absent terms score nothing") {
    val docs = Seq(
      (1L, "fox fox den"),                          // tf=2, short
      (2L, "fox and a very long tale about nothing at all here"), // tf=1
      (3L, "no relevant words whatsoever")
    ).toDF("doc_id", "text")
    val q = Seq("fox").toDF("term")
    val out = Retrieval.bm25(docs, q, "doc_id", "text")
      .orderBy(col("score").desc)
      .as[(Long, Double)].collect()
    // doc 3 shares no term -> absent entirely
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 > 0.0))
    // higher tf in a shorter doc must dominate
    assert(out(0)._2 > out(1)._2)
  }

  test("tfidfTopTerms: rare terms head the profile, k caps it, rank is total") {
    val docs = Seq(
      (1L, "shared shared unique alpha"), // "unique"/"alpha" df=1, "shared" df=3
      (2L, "shared beta beta"),
      (3L, "shared gamma")
    ).toDF("doc_id", "text")
    val out = Retrieval.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term")
      .as[(Long, Long, String)].collect().toSeq
    // doc 1 has 3 distinct terms -> capped at k=2. Scores: "shared"
    // tf=2 * (ln(4/4)+1) = 2.0 beats "unique"/"alpha" 1 * (ln(2)+1)
    // ~ 1.693; the equal singletons tie-break by term DESC, so
    // "unique" takes rank 2 and "alpha" is cut
    assert(out.filter(_._1 == 1L).map(t => (t._2, t._3)) ==
      Seq((1L, "shared"), (2L, "unique")))
    // doc 2: its df=1 term heads the profile over ubiquitous "shared"
    assert(out.filter(_._1 == 2L).head._3 == "beta")
    // every doc here has >= 2 distinct terms -> dense ranks 1..k
    assert(out.groupBy(_._1).values.forall(_.map(_._2) == Seq(1L, 2L)))
  }

  test("rrfFuse: contributions sum across lists, singletons still rank") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 60)
      .orderBy(col("rrf").desc, col("doc_id"))
      .select("doc_id", "n_lists", "best_rank", "rrf")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 20: 1/62 + 1/61 ~ 0.032524 dominates doc 10's 1/61 ~ 0.016393
    assert(out.map(_._1) == Seq(20L, 10L, 40L, 30L))
    assert(out.head._2 == 2L && out.head._3 == 1L)
    assert(math.abs(out.head._4 - (1.0 / 62 + 1.0 / 61)) < 1e-9)
    // every doc appearing anywhere is present exactly once
    assert(out.map(_._1).distinct.size == 4)
  }

  test("hashedTfidfVectors: unit norm, additive collisions, long-form sparse") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "alpha alpha alpha alpha")
    ).toDF("doc_id", "text")
    val out = Retrieval.hashedTfidfVectors(docs, "doc_id", "text",
        dim = 64)
      .as[(Long, Long, Double)].collect().toSeq
    // every vector l2-normalizes to ~1 (rounded weights)
    out.groupBy(_._1).values.foreach { rs =>
      assert(math.abs(rs.map(r => r._3 * r._3).sum - 1.0) < 1e-4)
    }
    assert(out.forall(r => r._2 >= 0 && r._2 < 64))
    // a single-term doc is a unit spike regardless of tf
    val spike = out.filter(_._1 == 2L)
    assert(spike.size == 1 && spike.head._3 == 1.0)
    // dim=1 forces every term into one bucket -> also a unit spike
    val one = Retrieval.hashedTfidfVectors(docs, "doc_id", "text",
        dim = 1)
      .as[(Long, Long, Double)].collect()
    assert(one.forall(r => r._2 == 0L && r._3 == 1.0))
  }

  test("sparseCosineTopK: self at rank 1, overlap beats disjoint") {
    val docs = Seq(
      (1L, "shared words plus alpha"),
      (2L, "shared words plus beta"),   // heavy overlap with 1
      (3L, "entirely different tokens") // no overlap with 1
    ).toDF("doc_id", "text")
    val vecs = Retrieval.hashedTfidfVectors(docs, "doc_id", "text",
      dim = 256)
    val out = Retrieval.sparseCosineTopK(vecs,
        Seq(1L).toDF("doc_id"), k = 3)
      .orderBy("rank")
      .select("doc_id", "rank", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    // self tops the list at ~1.0 (weights round to 6 places before the
    // dot product, so the self-cosine can land a few 1e-6 off 1)
    assert(out.head._1 == 1L && out.head._2 == 1L)
    assert(math.abs(out.head._3 - 1.0) < 1e-5)
    assert(out(1)._1 == 2L && out(1)._3 > 0.5)
    // doc 3 shares no bucket with doc 1 at dim=256 -> absent entirely
    // (the inverted index never generates the pair)
    assert(!out.map(_._1).contains(3L))
  }

  test("bm25: rarer term outweighs common term at equal tf") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common filler"),
      (3L, "common stuff"),
      (4L, "common words")
    ).toDF("doc_id", "text")
    val q = Seq("common", "rare").toDF("term")
    val out = Retrieval.bm25(docs, q, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // doc 1 matches both terms; the rare term's idf must push it above
    // any common-only doc by more than the common term's own score
    assert(out(1L) > out(2L) * 2)
  }
}
