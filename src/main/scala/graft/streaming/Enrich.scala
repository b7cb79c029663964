package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: decorate a stream with a STATIC dimension
  * frame — the third Structured Streaming join mode next to the
  * stream-stream interval join ([[Attribution]]) and stateful
  * dedup/sessionization. Stateless by construction: a stream-static
  * join keeps NO join state (the static side is re-resolved per
  * micro-batch and broadcast to every task), so there is no watermark,
  * no state store, and nothing to bound — each micro-batch is exactly
  * the batch broadcast join of its rows, which is what makes the
  * operator batch-differential down to the row.
  *
  * Left-outer with the stream on the left, so an event whose key is
  * missing from the dimension passes through with null metadata — the
  * same null-guarded decorate contract as the batch
  * [[graft.etl.Ops.decorate]].
  */
object Enrich {

  /** Decorate `stream` with `dimCols` of `dim` on `key` = `dimKey`.
    * The dim is broadcast-hinted: dimension-sized by contract, and a
    * shuffle would be illegal on the streaming side anyway.
    */
  def decorateStream(stream: DataFrame, key: String, dim: DataFrame,
      dimKey: String, dimCols: Seq[String]): DataFrame =
    stream.join(
      broadcast(dim.select((col(dimKey) +: dimCols.map(col)): _*)),
      col(key) === col(dimKey), "left_outer")
      .drop(dimKey)
}
