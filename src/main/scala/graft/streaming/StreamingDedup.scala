package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact dedup: the streaming face of
  * `graft.operators.Dedup.exact`. Rows are keyed by the md5 content
  * fingerprint (same normalization as the batch path) and duplicates are
  * dropped with watermark-bounded state — the only dedup state policy
  * that survives an unbounded stream: state for a fingerprint is held
  * only `delay` past its event time, then reclaimed. A duplicate
  * arriving later than `delay` after the original re-emits; that is the
  * documented trade (bounded state vs perfect recall) and the knob is
  * the watermark delay.
  */
object StreamingDedup {

  /** Append a `fp` fingerprint column and drop in-watermark duplicates.
    * Input must be a streaming DataFrame with an event-time column.
    */
  def dedupByContent(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    df.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
