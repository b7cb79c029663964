package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H}

/** Runtime-filter join: prune the BIG side of an equi-join with a
  * Bloom filter built from the small side's keys BEFORE the join
  * executes — the classic 100 TB star-join move when a selective
  * dimension predicate would otherwise let the full fact table reach
  * the join. The Bloom may pass false positives (the filter's fpp)
  * but NEVER drops a true match, and the join itself discards the
  * false positives — so the result is EXACTLY the plain join's, which
  * is what the oracle checks; the filter only changes how many fact
  * rows survive to the join's exchange.
  *
  * Shape: one aggregation over the (already filtered, small) dim side
  * builds the sketch driver-side ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]]
  * — bounded bits, the standard runtime-filter vehicle); the probe is
  * a codegen'd expression inside the fact scan's WholeStageCodegen
  * span ([[graft.expressions.NativeExpressions.BloomMightContain]]),
  * so pruned rows die at the scan and never reach an exchange. With
  * `broadcastSmall` the join itself is a broadcast hash join and the
  * fact side never shuffles at all. Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` does this adaptively for
  * shuffle joins; this operator is the explicit, plan-stable form for
  * when the dimension is known selective up front.
  */
object RuntimeFilter {

  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long, fpp: Double = 0.03,
      broadcastSmall: Boolean = true): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be > 0")
    val bloom = small.select(col(smallKey).cast("string").as("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val pruned = big.where(
      H.bloomMightContain(col(bigKey).cast("string"), bloom))
    val dim = if (broadcastSmall) broadcast(small) else small
    pruned.join(dim, pruned(bigKey) === dim(smallKey))
  }
}
