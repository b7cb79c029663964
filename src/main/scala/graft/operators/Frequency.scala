package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.MisraGriesAgg

/** Heavy-hitter detection with bounded memory: the two-pass
  * sketch-then-verify shape that replaces a full (item, count) shuffle
  * when the distinct count is huge (token vocabularies, URL hosts,
  * user ids) but only items above a frequency floor matter.
  */
object Frequency {

  /** Items occurring at least `minCount` times — EXACT output from an
    * approximate first pass.
    *
    * Pass 1: a Misra-Gries sketch sized `total/minCount + 1` counters
    * (so every true heavy hitter provably survives) runs as one
    * partial/final aggregate with O(capacity) buffers — the full
    * distinct set never shuffles. Pass 2 broadcast-filters the input to
    * the candidate superset (at most `capacity` items) and counts those
    * exactly; the final `>= minCount` filter makes the result exact and
    * deterministic regardless of partitioning — which is what lets an
    * external oracle state it as a plain GROUP BY ... HAVING.
    *
    * The sketch's survival guarantee holds ONLY at full capacity, so an
    * undersized sketch is refused rather than silently degraded: if
    * `total/minCount + 1` exceeds `maxCapacity` (default 10M counters,
    * ~several hundred MB of aggregate buffer) this throws — raise
    * `minCount` (each 10x on minCount is 10x fewer counters) or, if an
    * approximate candidate set is acceptable, raise `maxCapacity` to
    * what the executors can hold.
    *
    * @param total input row count (non-null items); callers usually
    *   already know it from an upstream observe/count — pass it rather
    *   than paying another scan.
    */
  def heavyHitters(df: DataFrame, itemCol: String, minCount: Long,
      total: Long, maxCapacity: Int = 10_000_000): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    val needed = total / minCount + 1L
    require(needed <= maxCapacity,
      s"heavyHitters needs $needed Misra-Gries counters for " +
        s"total=$total, minCount=$minCount, but maxCapacity=$maxCapacity; " +
        "beyond that the sketch can evict true heavy hitters and the " +
        "output would no longer be exact. Raise minCount (counters " +
        "shrink linearly) or raise maxCapacity if executors can hold it.")
    val capacity = math.max(1L, needed).toInt
    val candidates = df
      .agg(MisraGriesAgg.sketch(col(itemCol), capacity).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.item").as(itemCol))
    df.join(broadcast(candidates), itemCol)
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
