package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-driven join planning — the join-shape sibling of
  * [[ShapeSelect]] (VERDICT r18 stretch): estimate a join's output
  * cardinality from BOUNDED per-side profiles and route the physical
  * shape (broadcast / shuffle-hash / sort-merge) from measured counts
  * instead of static defaults. Spark's own CBO needs ANALYZE-time
  * statistics that ad-hoc parquet inputs rarely carry, and AQE can
  * only re-plan stages it has already paid for; this advisor spends
  * one narrow key-column pass per side — a map-side-combinable
  * aggregation whose shuffle carries at most 2^p register rows — and
  * decides before any join stage launches.
  *
  * Per-side profile, ONE aggregation each: the HLL register table
  * ([[Sketches.hllRegisters]]'s bit-idiom) with the exact row count
  * riding along as a per-register count — so `rows` is exact, and
  * `distinctEst` is the same md5-60 raw-HLL estimate the rest of the
  * engine uses (bit-replayable by a SQL oracle, [[Sketches]]'s
  * determinism discipline: ordered fold in register order, exact
  * `pow(2,-r)`). NULL keys are excluded from both — they never match
  * an equi-join.
  *
  * The output estimate is the classic containment formula
  * `|L ⋈ R| ≈ n_l * n_r / max(d_l, d_r)` — exact when the
  * higher-cardinality side's keys contain the other's and
  * multiplicities are uniform, an upper-ish bound otherwise; at p=5
  * the HLL raw error (~18%) dominates. That is advisory precision:
  * the router's inputs (the exact row counts) are what pick the
  * strategy, and a mis-estimated `estRows` costs a warning flag, not
  * correctness — every strategy is output-identical.
  *
  * 100 TB shape: the profile shuffles <= 2^p rows per side and
  * collects one <= 2^p-row register array per side (bounded by
  * construction, the [[Ann]] centroid-matrix contract); the routed
  * join then avoids the two classic cliffs — sort-merging a
  * broadcastable dim, and broadcasting a "dim" that is secretly 500M
  * rows (the static-hint failure this replaces).
  */
object JoinAdvisor {

  /** Exact row count + raw-HLL distinct estimate of one join side. */
  final case class SideProfile(rows: Long, distinctEst: Double)

  /** The advisor's verdict and the evidence it derives from.
    * `estRows` is the containment estimate rounded at 2; `explosive`
    * flags a many-to-many blow-up (est past `explodeFactor` x the
    * combined input rows) — the join a pipeline should gate or
    * pre-aggregate rather than run blind.
    */
  final case class Advice(nLeft: Long, nRight: Long, dLeft: Double,
      dRight: Double, estRows: Double, strategy: String,
      explosive: Boolean)

  /** One-pass side profile: register max-ranks AND per-register exact
    * counts from a single map-side-combinable aggregation; the <= 2^p
    * register rows collect to the driver (bounded by construction)
    * where the count sum and the ordered-fold estimate evaluate with
    * EXACTLY the arithmetic of [[Sketches.hllMergeEstimate]] — same
    * fold order (register-id ascending), exact powers of two, same
    * left-associated alpha constant — so a SQL oracle replays the
    * estimate bit-for-bit.
    */
  def profile(df: DataFrame, keyCol: String, p: Int = 5): SideProfile = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val regs = df.where(col(keyCol).isNotNull)
      .select(Sketches.h60(col(keyCol)).as("h"))
      .select(col("h").bitwiseAND(lit((m - 1).toLong)).as("j"),
        (lit(61 - p) -
          length(ltrim(bin(shiftright(col("h"), p)), "0")))
          .cast("long").as("r"))
      .groupBy("j")
      .agg(max(col("r")).as("r"), count(lit(1)).as("c"))
      .collect() // <= 2^p rows, bounded by construction
    val n = regs.map(_.getAs[Long]("c")).sum
    if (n == 0L) return SideProfile(0L, 0.0)
    // ONE estimator implementation (Sketches.hllEstimateFromRegisters
    // shares the alpha table and the ordered fold with the DataFrame
    // form) — a local copy could drift and break the oracle replay
    val est = BigDecimal(Sketches.hllEstimateFromRegisters(
        regs.map(r => (r.getAs[Long]("j"), r.getAs[Long]("r"))).toSeq, p))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    SideProfile(n, est)
  }

  /** Profile both sides and decide. Strategy, on EXACT counts:
    * `broadcast_right`/`broadcast_left` when a side fits
    * `broadcastRows`; else `shuffle_hash_right`/`_left` when one side
    * is 4x+ smaller (hash-building the small side beats sorting both);
    * else `sort_merge`. Right-side routes win ties (dims
    * conventionally sit right).
    */
  def advise(left: DataFrame, right: DataFrame, keyL: String,
      keyR: String, p: Int = 5, broadcastRows: Long = 10000000L,
      explodeFactor: Double = 4.0): Advice = {
    require(broadcastRows > 0, s"broadcastRows > 0, got $broadcastRows")
    val l = profile(left, keyL, p)
    val r = profile(right, keyR, p)
    val est = BigDecimal(
      l.rows.toDouble * r.rows.toDouble /
        math.max(math.max(l.distinctEst, r.distinctEst), 1.0))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val strategy =
      if (r.rows <= broadcastRows) "broadcast_right"
      else if (l.rows <= broadcastRows) "broadcast_left"
      else if (r.rows * 4 <= l.rows) "shuffle_hash_right"
      else if (l.rows * 4 <= r.rows) "shuffle_hash_left"
      else "sort_merge"
    Advice(l.rows, r.rows, l.distinctEst, r.distinctEst, est, strategy,
      explosive = est > explodeFactor * (l.rows + r.rows).toDouble)
  }

  /** Equi-join routed by [[advise]]: the decided strategy enters the
    * plan as a join hint, so Catalyst builds BroadcastHashJoin /
    * ShuffledHashJoin / SortMergeJoin accordingly. All strategies are
    * output-identical (the [[ShapeSelect]] licence: a probe
    * mis-estimate costs only the smaller tax, never correctness).
    * Returns (joined frame, the advice it acted on).
    */
  def autoJoin(left: DataFrame, right: DataFrame, keyL: String,
      keyR: String, joinType: String = "inner", p: Int = 5,
      broadcastRows: Long = 10000000L): (DataFrame, Advice) = {
    val a = advise(left, right, keyL, keyR, p, broadcastRows)
    val cond = left(keyL) === right(keyR)
    val joined = a.strategy match {
      case "broadcast_right"    => left.join(broadcast(right), cond, joinType)
      case "broadcast_left"     => broadcast(left).join(right, cond, joinType)
      case "shuffle_hash_right" => left.join(right.hint("shuffle_hash"), cond, joinType)
      case "shuffle_hash_left"  => left.hint("shuffle_hash").join(right, cond, joinType)
      case _                    => left.join(right.hint("merge"), cond, joinType)
    }
    (joined, a)
  }
}
