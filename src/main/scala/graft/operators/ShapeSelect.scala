package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-driven routing between the plain and hot-entity-safe shapes of
  * the per-key window operators ([[Events.sessionize]] /
  * [[Events.sessionPrefixes]] / [[AsofJoin.asofBackward]] and their
  * bucketed twins). The engine carries both shapes because neither is
  * a safe static default (the x100 probes, BENCH_SF10_skew_r15.json):
  * the plain per-key window serializes a hot entity onto one reducer —
  * 2.2-3.2x over uniform at a 14% hot key and GROWING with scale,
  * unboundedly (a billion-event entity is a single task that never
  * finishes) — while the bucketed two-phase shapes pay a fixed
  * 1.4-2.1x tax on uniform keys they don't need. `auto` mode probes
  * the key distribution and picks per input.
  *
  * The probe is ADVISORY, never a correctness risk: both shapes are
  * output-identical (differential-pinned in OpsSpec and oracle-checked
  * against the same DuckDB SQL), so a mis-estimate costs only the
  * smaller of the two taxes. That is what licenses estimating it from
  * a sample.
  *
  * Scale shape of the probe itself: one map-side-combinable groupBy on
  * the key (the shuffle carries one row per key), one single-row
  * rollup, one bounded driver collect. Against the window pass it
  * gates — a full sort of the same volume — the probe is a small
  * fraction of the operator's own cost, and `probeFraction` thins the
  * per-key counting work (a 1% sample detects any share past the
  * default threshold with overwhelming probability at 100 TB row
  * counts) while the time bounds stay exact over every row, so
  * derived bucket spans never drift (ADVICE r16).
  */
object ShapeSelect {

  /** Default top-key share past which the bucketed shape wins. The
    * measured crossover band: bucketed tax on uniform keys is
    * 1.37-2.13x, the plain cliff at a 14% key is 2.2-3.2x and grows
    * with absolute volume. Share is scale-FREE, so the threshold errs
    * low: 5% of a 100 TB event log is 5 TB on one reducer —
    * unrunnable — while a false-bucketed on a borderline-uniform
    * input costs at most the ~2x tax.
    */
  val DefaultShareThreshold = 0.05

  /** Default absolute per-key row bound — the scale-DEPENDENT arm the
    * share test misses: a corpus with a billion keys can hold a
    * 10 M-row entity at share 1e-5. Past ~4 M rows a single-task
    * timeline sort (hundreds of MB buffered, spill-prone) costs more
    * than the bucketed tax regardless of share.
    */
  val DefaultMaxKeyRows = 4000000L

  /** Probe verdict plus the evidence it was made from. `estTopRows`
    * scales the observed top count back up by `probeFraction`;
    * `minTime`/`maxTime` (long-cast `timeCol` bounds) let callers
    * derive a bucket span without a second scan — they are EXACT
    * global bounds even under `probeFraction < 1` (ADVICE r16: bounds
    * read off a sample under-cover, so a derived bucket span would
    * spill past `targetBuckets` whenever the true extremes missed the
    * sample; the probe therefore samples only the COUNTS and keeps
    * min/max over every row — same single pass, since `sample` never
    * pushes below the scan anyway). `nKeys` is likewise the exact
    * distinct-key count (the grouping sees all rows). Empty input
    * probes as unskewed (zero counts, `bucketed = false`).
    */
  final case class Decision(
      nRows: Long, nKeys: Long, topRows: Long, topShare: Double,
      estTopRows: Long, minTime: Long, maxTime: Long,
      bucketed: Boolean)

  /** Probe `df`'s per-key volume and decide the shape: bucketed iff
    * the top key's share reaches `shareThreshold` OR its estimated
    * absolute row count reaches `maxKeyRows`. NULL keys count as one
    * key — exactly how the window shapes partition them.
    *
    * `timeCol` must be long-castable (the operators this routes
    * already require that); its global bounds ride along in the same
    * aggregate for callers that derive bucket spans.
    */
  def decide(df: DataFrame, keyCols: Seq[String], timeCol: String,
      shareThreshold: Double = DefaultShareThreshold,
      maxKeyRows: Long = DefaultMaxKeyRows,
      probeFraction: Double = 1.0, seed: Long = 42L): Decision = {
    require(keyCols.nonEmpty, "decide: need at least one key column")
    require(shareThreshold > 0 && shareThreshold <= 1,
      s"shareThreshold must be in (0, 1], got $shareThreshold")
    require(maxKeyRows > 0, s"maxKeyRows must be > 0, got $maxKeyRows")
    require(probeFraction > 0 && probeFraction <= 1,
      s"probeFraction must be in (0, 1], got $probeFraction")
    // Bernoulli row flag instead of df.sample: the flag samples the
    // COUNT aggregate only, while min/max stay over EVERY row — the
    // time bounds come out exact, so spans derived from them cannot
    // drift past targetBuckets when an extreme misses the sample
    // (ADVICE r16). Cost is identical: sample() scans everything too
    // (no source pushdown), it only thins the aggregation input.
    val inProbe =
      if (probeFraction < 1.0) rand(seed) < probeFraction else lit(true)
    val tL = col(timeCol).cast("long")
    val perKey = df
      .select(keyCols.map(col) :+ tL.as("__t") :+
        inProbe.as("__in"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(when(col("__in"), 1L).otherwise(0L)).as("__n"),
        min(col("__t")).as("__mn"), max(col("__t")).as("__mx"))
    val r = perKey.agg(
      coalesce(sum("__n"), lit(0L)).as("nr"),
      count(lit(1)).as("nk"),
      coalesce(max("__n"), lit(0L)).as("top"),
      min("__mn").as("mn"), max("__mx").as("mx")).collect()(0)
    val nRows = r.getLong(0)
    val nKeys = r.getLong(1)
    val top = r.getLong(2)
    val share = if (nRows == 0) 0.0 else top.toDouble / nRows
    val estTop = math.ceil(top / probeFraction).toLong
    Decision(
      nRows = nRows, nKeys = nKeys, topRows = top, topShare = share,
      estTopRows = estTop,
      minTime = if (r.isNullAt(3)) 0L else r.getLong(3),
      maxTime = if (r.isNullAt(4)) 0L else r.getLong(4),
      bucketed = nRows > 0 &&
        (share >= shareThreshold || estTop >= maxKeyRows))
  }
}
