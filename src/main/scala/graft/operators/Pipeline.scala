package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{TextFunctions => T}

/** Declarative curation-pipeline runner — the LLM-corpus analogue of
  * the reference's config-driven connector loop
  * (`related_items_etl.py:237-315`'s "read config, run the declared
  * stages in order" shape, re-expressed over this library's curation
  * operators): a typed stage list (filter -> dedup -> near-dedup ->
  * sample) evaluated as ONE lazy dataflow with per-stage survivor
  * accounting, instead of N hand-wired scripts each materializing its
  * predecessor.
  *
  * Execution model — flags, not sequential filters: every stage
  * contributes a boolean column `__s<i>` to a single flagged frame;
  * a row survives stage i when `__s0 && ... && __si`. Data-derived
  * stage parameters (a source's mean score, the dedup keeper sets)
  * are computed from the frame filtered by the PRECEDING flags, so
  * the composed run is semantically identical to running the stages
  * one-by-one with hard filters — PipelineSpec proves row-for-row
  * equality — while the whole pipeline stays one DAG: one terminal
  * action materializes every stage, and the per-stage manifest
  * (rows_in/rows_out per stage) falls out of ONE aggregation over
  * the flagged frame rather than one count() job per stage.
  *
  * 100 TB shape: flags add bytes per row, never rows; the only
  * shuffles are the ones the underlying operators already pay (the
  * dedup groupBys, the near-dup prefix join), and the manifest is a
  * single map-side-combinable aggregate. Pins follow the
  * [[Dedup.jaccardJoin]] ownership contract: intermediates route
  * through one buffer, the internal terminal action frees them
  * (`release()` drops the final pin), or pass `pinsOut` to compose
  * this pipeline lazily into a still-larger dataflow.
  */
object Pipeline {

  sealed trait Stage { def label: String }

  /** Keep rows whose `srcCol` group's mean `scoreCol` — computed over
    * the rows alive at this stage — reaches `minMean`
    * ([[Curation.sourceFilter]]'s semantics). NULL sources never
    * match a surviving group and drop.
    */
  final case class SourceFilter(srcCol: String, scoreCol: String,
      minMean: Double, label: String = "source_filter") extends Stage

  /** Keep rows satisfying an ANSI SQL boolean expression (NULL drops
    * — same convention as [[Checks.Predicate]]). The expression must
    * be engine-portable; an external oracle evaluates it identically.
    */
  final case class RowFilter(sqlExpr: String,
      label: String = "row_filter") extends Stage

  /** Keep one row per distinct normalized-content fingerprint: the
    * minimum id ([[Dedup.exact]]'s keeper convention), fingerprints
    * computed over the rows alive at this stage.
    */
  final case class ExactDedup(textCol: String,
      label: String = "exact_dedup") extends Stage

  /** Drop every id that appears as the LARGER id of a pair with
    * shingle Jaccard >= `threshold` among the rows alive at this
    * stage ([[Dedup.jaccardJoin]] underneath — exact, recall 1.0).
    * Conservative pair-drop semantics: in a chain a~b~c both b and c
    * drop even though b (c's only witness) is itself dropped —
    * deterministic and one anti-join; use [[Dedup.dedupGroups]] when
    * group-keeper semantics are required.
    */
  final case class NearDedup(textCol: String, threshold: Double,
      shingleWidth: Int = 3, label: String = "near_dedup") extends Stage

  /** Keep rows by salted-hash per-stratum rates
    * ([[Sampling.stratifiedKeep]] — deterministic, RNG-free; unknown
    * strata fall back to `defaultPpm`).
    */
  final case class StratifiedSample(stratumCol: String,
      ratesPpm: Map[String, Long], defaultPpm: Long,
      label: String = "stratified_sample") extends Stage

  /** `rows`: the surviving rows (input columns, input order).
    * `manifest`: (stage_ix, stage, rows_in, rows_out), one row per
    * stage in declaration order — lazy, derived from one aggregation.
    * `release()`: unpersist the pipeline's pin (no-op under
    * `pinsOut`); the returned frames recompute from lineage after
    * release — slower, still exact.
    */
  final case class Result(rows: DataFrame, manifest: DataFrame,
      release: () => Unit)

  def run(docs: DataFrame, idCol: String, stages: Seq[Stage],
      cache: Option[StorageLevel] = None,
      pinsOut: Option[scala.collection.mutable.Buffer[DataFrame]] = None)
      : Result = {
    require(stages.nonEmpty, "no stages given")
    require(!docs.columns.exists(_.startsWith("__")),
      s"input columns must not start with __: ${docs.columns.mkString(",")}")
    val level = cache.getOrElse(StorageLevel.MEMORY_AND_DISK)
    val pins = pinsOut.getOrElse(
      scala.collection.mutable.ArrayBuffer.empty[DataFrame])
    val inputCols = docs.columns.toSeq
    var cur = docs
    // conjunction of the flags declared so far — each stage's
    // data-derived parameters read only rows alive BEFORE it, which
    // is exactly what sequential execution would hand the stage
    var alive: Column = lit(true)
    val flags = scala.collection.mutable.ArrayBuffer.empty[String]
    // Truncate the plan before every stage whose construction
    // references `cur` TWICE (params subtree + main stream): without
    // it the logical tree DOUBLES at each such stage — five stages
    // deep the terminal action was optimizing a 29k-line plan with
    // ~3,000 Exchange nodes (round-22 profile: 7.2 s of an 8.4 s wall
    // inside Catalyst, 1.3 s of actual job time; guide §7.3 "planning
    // time itself can become the bottleneck", §3.3 "materialising an
    // intermediate truncates the plan"). A LAZY localCheckpoint
    // rewraps the stage-so-far as a LogicalRDD LEAF at build time
    // without running anything — the single terminal action below
    // still materializes the whole chain in one DAG (each level
    // persists at the checkpoint's storage level as it computes), so
    // the one-action contract and the per-stage manifest semantics
    // are untouched, but planning cost is now the SUM of per-stage
    // small trees instead of their product. Merely persist()ing `cur`
    // does NOT fix this: cache substitution rewrites the plan only at
    // execution, so analysis + cache-lookup still walk the
    // exponential tree (measured: pins alone made the query SLOWER,
    // 13.4 s vs 9.8 s). Trade (same as Dedup.dedupGroups' doc): the
    // truncated levels live as checkpoint blocks outside CacheManager
    // — release() cannot drop them (the ContextCleaner frees them
    // when the RDDs are GC'd), and on executor loss a level cannot
    // recompute from lineage.
    stages.zipWithIndex.foreach { case (st, i) =>
      val fc = s"__s$i"
      st match {
        case SourceFilter(src, score, minMean, _) =>
          cur = cur.localCheckpoint(false)
          val good = cur.where(alive).groupBy(col(src))
            .agg(avg(col(score)).as("__mean"))
            .where(col("__mean") >= minMean)
            .select(col(src), lit(true).as(fc))
          cur = cur.join(broadcast(good), Seq(src), "left")
            .withColumn(fc, coalesce(col(fc), lit(false)))
        case RowFilter(sqlExpr, _) =>
          cur = cur.withColumn(fc,
            coalesce(expr(sqlExpr).cast("boolean"), lit(false)))
        case ExactDedup(textCol, _) =>
          cur = cur.localCheckpoint(false)
          val keepers = cur.where(alive)
            .select(col(idCol), T.fingerprint(col(textCol)).as("__fp"))
            .groupBy("__fp").agg(min(col(idCol)).as(idCol))
            .select(col(idCol), lit(true).as(fc))
          cur = cur.join(keepers, Seq(idCol), "left")
            .withColumn(fc, coalesce(col(fc), lit(false)))
        case NearDedup(textCol, thr, w, _) =>
          cur = cur.localCheckpoint(false)
          // pins route into THIS pipeline's buffer (ownership
          // transfer): jaccardJoin returns lazily and our single
          // terminal action below materializes its internals too
          val pairs = Dedup.jaccardJoin(
            cur.where(alive).select(col(idCol), col(textCol)),
            idCol, textCol, thr, w, Some(level), pinsOut = Some(pins))
          val drops = pairs.select(col("id_b").as(idCol)).distinct()
            .withColumn(fc, lit(true))
          cur = cur.join(drops, Seq(idCol), "left")
            .withColumn(fc, col(fc).isNull)
        case StratifiedSample(stratum, rates, defPpm, _) =>
          cur = cur.withColumn(fc, Sampling.stratifiedKeep(
            col(idCol), col(stratum), rates, defPpm))
      }
      alive = alive && col(fc)
      flags += fc
    }
    // the flagged frame feeds BOTH the survivor stream and the
    // manifest aggregate — pinned, or each consumer replays every
    // stage's joins
    val flagged = { val p = cur.persist(level); pins += p; p }
    val aggCols = count(lit(1)).as("__in") +: flags.indices.map { i =>
      val conj = flags.take(i + 1).map(col).reduce(_ && _)
      sum(when(conj, 1L).otherwise(0L)).as(s"__out$i")
    }
    val aggRow = flagged.agg(aggCols.head, aggCols.tail: _*)
    val manifest = aggRow.select(explode(array(
      stages.zipWithIndex.map { case (st, i) =>
        struct(lit(i).as("stage_ix"), lit(st.label).as("stage"),
          (if (i == 0) col("__in") else col(s"__out${i - 1}"))
            .as("rows_in"),
          col(s"__out$i").as("rows_out"))
      }: _*)).as("m")).select("m.*")
    val rows = flagged.where(flags.map(col).reduce(_ && _))
      .select(inputCols.map(col): _*)
    pinsOut match {
      case Some(_) => Result(rows, manifest, () => ())
      case None =>
        // ONE terminal action materializes the flag frame (and every
        // jaccard internal beneath it); then free the internals —
        // cascade=false keeps flagged's own buffers alive
        flagged.count()
        pins.filterNot(_ eq flagged).foreach(_.unpersist(false))
        Result(rows, manifest, () => { flagged.unpersist(false); () })
    }
  }
}
