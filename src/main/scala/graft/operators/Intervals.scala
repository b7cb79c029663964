package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the range-join shape Spark's built-in
  * equi-join machinery can't express without a broadcast-nested-loop
  * (which is a cross product at 100 TB). Both sides carry CLOSED
  * integer intervals [start, end]; a left row pairs with every right
  * row of the same key whose interval intersects it.
  *
  * Technique: replicate each interval to the fixed-width time buckets
  * it covers, equi-join on (keys..., bucket), and keep a matched pair
  * only in the single bucket containing `max(leftStart, rightStart)`.
  * Overlapping closed intervals both contain that instant, so both
  * sides are guaranteed replicated into that bucket and each pair is
  * emitted EXACTLY once — no post-join `distinct` (which would be a
  * second full shuffle of the matched volume). The join itself is a
  * plain shuffled equi-join: Catalyst and AQE treat it like any other
  * (key, bucket) join — skew-split, bucketable, broadcastable.
  *
  * `bucketSpan` trades replication against candidate density: each
  * row is replicated `span(interval)/bucketSpan + 1` times, while a
  * bucket only pairs rows that could plausibly overlap. Pick it near
  * the typical interval length (a day for day-scale validity
  * intervals). Cost is sum over buckets of |left_b| x |right_b| per
  * key — linear in matched pairs when intervals are short relative to
  * the span, never the all-pairs product a per-key cross join pays.
  *
  * Contract: interval bounds are non-null integers with
  * start <= end (violating rows are dropped, matching the empty-set
  * semantics of an inverted interval) and |bound| < 2^53 (bucket ids
  * compute through an exact double division of span multiples —
  * microsecond epochs through year ~2200 fit with 3 orders to
  * spare). Open-ended intervals must be clamped by the caller to a
  * finite horizon first (e.g. the key's last event time), otherwise
  * the replication would be unbounded by construction.
  *
  * Output: left columns ++ right non-key columns, with right columns
  * that clash renamed under `rightSuffix`.
  */
object Intervals {

  /** Exact floor division for span multiples (see the 2^53 note). */
  private def fdiv(c: Column, span: Long): Column =
    ((c - pmod(c, lit(span))) / lit(span)).cast("long")

  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketSpan: Long, rightSuffix: String = "_r"): DataFrame = {
    require(keys.nonEmpty, "overlapJoin needs at least one key column")
    require(bucketSpan > 0, s"bucketSpan must be positive: $bucketSpan")
    val clash = (right.columns.toSet -- keys)
      .intersect(left.columns.toSet)
    val renamed = clash.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, c + rightSuffix))
    val rs = if (clash(rightStart)) rightStart + rightSuffix else rightStart
    val re = if (clash(rightEnd)) rightEnd + rightSuffix else rightEnd
    def replicate(df: DataFrame, s: String, e: String) = df
      .where(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(s), bucketSpan), fdiv(col(e), bucketSpan))))
    replicate(left, leftStart, leftEnd)
      .join(replicate(renamed, rs, re), keys :+ "__bucket")
      .where(col(leftStart) <= col(re) && col(rs) <= col(leftEnd) &&
        col("__bucket") === fdiv(greatest(col(leftStart), col(rs)), bucketSpan))
      .drop("__bucket")
  }
}
