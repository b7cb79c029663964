package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming view->conversion attribution: a watermarked stream-stream
  * interval join. Each conversion joins the views of the same key whose
  * time precedes it by at most `windowSpec` — the streaming counterpart
  * of [[graft.operators.AsofJoin]]'s batch decoration (streaming state
  * cannot express "latest only", so the interval bounds the state
  * instead: both sides' watermarks let Spark evict rows once they can
  * no longer join).
  */
object Attribution {

  /** Interval join: (view, conversion) pairs with
    * `conv.time - window <= view.time <= conv.time`, both sides
    * watermarked by `delay`. Columns of both inputs are preserved;
    * callers rename to avoid clashes (the key columns stay separate).
    *
    * `joinType` "inner" (default) or "left_outer": left-outer keeps
    * every view, and in a STREAMING run an unconverted view emits its
    * null-conversion row only once both watermarks pass the end of
    * its join window — state eviction IS the emission trigger, which
    * is exactly what makes the result equal the batch left join once
    * the stream drains past the window (differential-tested with a
    * watermark-advancing sentinel).
    */
  def viewConversionJoin(views: DataFrame, viewKey: String,
      viewTime: String, conversions: DataFrame, convKey: String,
      convTime: String, windowSpec: String, delay: String,
      joinType: String = "inner"): DataFrame = {
    val v = views.withWatermark(viewTime, delay)
    val c = conversions.withWatermark(convTime, delay)
    v.join(c,
      col(viewKey) === col(convKey) &&
        col(convTime) >= col(viewTime) &&
        col(convTime) <= col(viewTime) + expr(s"INTERVAL $windowSpec"),
      joinType)
  }
}
