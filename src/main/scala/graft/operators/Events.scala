package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Event-stream operators over a (user, ts, type, value) log: tumbling-
  * window aggregation and gap-based sessionization. Batch shapes here —
  * the same transforms run under Structured Streaming with a watermark
  * (see StreamingSpec); sums use decimal because double summation order
  * is partition-dependent and would make results non-reproducible.
  */
object Events {

  /** Microsecond-epoch view of an event-log `ts` column, independent of
    * the parquet encoding the generator used. TIMESTAMP(NANOS) data
    * surfaces as a nanosecond LongType under
    * `spark.sql.legacy.parquet.nanosAsLong` — integer `div` keeps the
    * e18-scale arithmetic exact where double division would lose
    * microseconds. `timestamp[us]` data surfaces as TIMESTAMP_NTZ (or
    * TIMESTAMP when the writer flagged UTC adjustment) — `unix_micros`
    * on the session-UTC reading maps the naive wall clock to the same
    * epoch DuckDB's `epoch_us` computes (all entry points pin
    * `spark.sql.session.timeZone=UTC`).
    */
  def tsMicros(events: DataFrame, tsCol: String = "ts"): Column =
    events.schema(tsCol).dataType match {
      case LongType         => expr(s"$tsCol div 1000")
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case TimestampType    => unix_micros(col(tsCol))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time column $tsCol: $other " +
          "(expected ns-long, TIMESTAMP, or TIMESTAMP_NTZ)")
    }

  /** Tumbling- or sliding-window aggregate: (window start, event_type)
    * -> count + exact decimal sum. Shuffles once on the (window, type)
    * grouping key; map-side partial aggregation applies. A `slide`
    * shorter than `windowLength` replicates each row windowLength/slide
    * times BEFORE the shuffle (Spark expands eagerly) — keep the ratio
    * small at scale.
    */
  def windowedAgg(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      windowLength: String = "1 hour", slide: Option[String] = None)
      : DataFrame =
    events
      .groupBy(window(col(tsCol), windowLength,
        slide.getOrElse(windowLength)).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"),
        // exact decimal accumulation (order-independent), surfaced as
        // double — a decimal output column hashes differently across
        // engines (28,6 vs 38,6), double of the same exact value doesn't
        sum(col(valueCol).cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), col(typeCol), col("n"), col("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. One window
    * (per-user sort) assigns `session_seq` via lag + running sum — the
    * standard relational sessionize, identical in any warehouse, so the
    * DuckDB oracle can state it exactly. `orderCols` must totally order
    * events within a user (ties would make lag nondeterministic).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(orderCols.map(col): _*)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev").cast("long") >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(w))
      .drop("__prev", "__new")
  }

  /** Next-event training sequences from sessionized logs: for every
    * event beyond the first of its session, the ordered ids of up to
    * `maxPrefix` PRIOR session events as the model input and the event
    * itself as the label — the example generator for next-item /
    * next-event sequence models.
    *
    * Scale shape: one additional window over the [[sessionize]] pass
    * with a BOUNDED frame (ROWS maxPrefix PRECEDING .. 1 PRECEDING),
    * so the running buffer is O(maxPrefix) per position — matching the
    * sequence model's own context cap, where an unbounded prefix would
    * buffer whole sessions. The window reuses sessionize's per-user
    * partitioning, so no extra shuffle shape beyond the user key.
    *
    * @return (userCol, session_seq, prefix, label)
    */
  def sessionPrefixes(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int, orderCols: Seq[String],
      maxPrefix: Int = 50): DataFrame = {
    require(maxPrefix > 0, "maxPrefix must be > 0")
    val sess = sessionize(events, userCol, tsCol, gapMinutes, orderCols)
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-maxPrefix, -1)
    sess.withColumn("prefix", collect_list(col(idCol)).over(w))
      .where(size(col("prefix")) > 0)
      .select(col(userCol), col("session_seq"), col("prefix"),
        col(idCol).as("label"))
  }

  /** Time-windowed per-key dedup: drop an event arriving within
    * `windowSeconds` of the PREVIOUS event of the same key — the
    * log-cleanup pass for at-least-once ingestion (client retries,
    * double-fires). Previous-EVENT semantics, not previous-kept: one
    * lag window, no iteration, identical in any warehouse — so a burst
    * keeps only events whose gap to their immediate predecessor
    * exceeds the window. `orderCols` must totally order events within
    * a key. One shuffle (the window's partition-by); at scale the key
    * space (user x type) is wide, so no reducer sees more than one
    * key's timeline.
    */
  def dedupWithin(events: DataFrame, keyCols: Seq[String], tsCol: String,
      windowSeconds: Long, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    events.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .where(col("__prev").isNull ||
        col(tsCol).cast("long") - col("__prev").cast("long") >
          windowSeconds)
      .drop("__prev")
  }

  /** Per-session rollup over [[sessionize]] output. */
  def sessionStats(sessions: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    sessions.groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long"))
          .as("duration_s"))
}
