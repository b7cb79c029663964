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

  /** Hot-key-safe sessionization: identical output to [[sessionize]],
    * computed in two phases so no reducer ever sorts one user's whole
    * timeline. The plain shape partitions its window by `userCol`
    * alone, so a hot entity (one user holding 14% of a 10 M-event log
    * in the x100 skew probe) serializes on a single reducer — measured
    * at 2.3x over uniform keys at x100 data, and growing with scale.
    *
    * Phase 1 partitions by (user, time bucket) — the time dimension is
    * the salt, so the hot user's timeline spreads over
    * range/bucketSeconds reducers — and runs the standard lag+gap
    * logic locally. Phase 2 operates on ONE SUMMARY ROW PER
    * (user, bucket) — first/last event time and local session count —
    * merges boundary sessions where the cross-bucket gap is within
    * `gapMinutes` (a session spanning k buckets chain-merges through k
    * summary rows), and prefix-sums the per-bucket session offsets.
    * The summary frame is smaller than the input by the average
    * events-per-bucket factor, so its per-user window is O(buckets),
    * never O(events); the offset join back to phase 1 is on the same
    * (user, bucket) key the phase-1 shuffle already established.
    *
    * Contract (same as [[sessionize]] plus two conditions the merge
    * relies on): `orderCols` must totally order a user's events AND be
    * consistent with `tsCol` (ts nondecreasing under orderCols — true
    * for the canonical (ts_us, event_id) ordering over a coarser ts_s
    * gap column); `tsCol` must be non-null. Equal-ts events always
    * land in one bucket, so ordering never straddles a boundary.
    *
    * `bucketSeconds` trades merge work against spread: buckets much
    * longer than the gap keep the summary frame tiny (few merges);
    * buckets shorter than the gap still produce correct chains but
    * one summary row per event in the limit. Default 4x the gap.
    */
  def sessionizeBucketed(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, orderCols: Seq[String],
      bucketSeconds: Long = 0L): DataFrame =
    sessionizeBucketedWithPos(events, userCol, tsCol, gapMinutes,
      orderCols, bucketSeconds).drop("__pos")

  /** [[sessionizeBucketed]] plus a dense per-user timeline position
    * `__pos` (1..N under `orderCols`), computed inside the same
    * two-phase pass — local `row_number` within (user, bucket) plus the
    * per-bucket cumulative row count. A direct `row_number` over the
    * user alone would re-serialize the hot timeline this operator
    * exists to spread; the chunked prefix path ([[sessionPrefixes]])
    * needs the position to bound its window partitions.
    */
  private[graft] def sessionizeBucketedWithPos(events: DataFrame,
      userCol: String, tsCol: String, gapMinutes: Int,
      orderCols: Seq[String], bucketSeconds: Long = 0L): DataFrame = {
    val gapS = gapMinutes * 60L
    val bucketS = if (bucketSeconds > 0) bucketSeconds else 4 * gapS
    val u = col(userCol)
    val tsL = col(tsCol).cast("long")
    // exact floor division via pmod (epoch seconds may predate 1970;
    // the intermediate double quotient is exact for any |ts| < 2^53 s)
    val bkt = ((tsL - pmod(tsL, lit(bucketS))) / lit(bucketS))
      .cast("long")
    val w1 = Window.partitionBy(u, col("__bkt"))
      .orderBy(orderCols.map(col): _*)
    val local = events.withColumn("__bkt", bkt)
      .withColumn("__prev", lag(col(tsCol), 1).over(w1))
      .withColumn("__new",
        when(col("__prev").isNull ||
          tsL - col("__prev").cast("long") > gapS, 1L).otherwise(0L))
      .withColumn("__lseq", sum(col("__new")).over(w1))
      .withColumn("__rn", row_number().over(w1).cast("long"))
      .drop("__prev", "__new")
    val summary = local.groupBy(u, col("__bkt"))
      .agg(min(tsL).as("__first"), max(tsL).as("__last"),
        max(col("__lseq")).as("__n"), count(lit(1)).as("__cnt"))
    val ws = Window.partitionBy(u).orderBy(col("__bkt"))
    val wsBefore = Window.partitionBy(u).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // __m = 1 when the bucket's first event continues the previous
    // bucket's last session; each bucket then contributes (__n - __m)
    // NEW sessions, and a local seq s maps to global
    // sum-of-prior-contributions + s - __m (s = __m = 1 lands exactly
    // on the previous bucket's last global seq)
    val offsets = summary
      .withColumn("__prevLast", lag(col("__last"), 1).over(ws))
      .withColumn("__m",
        when(col("__prevLast").isNull ||
          col("__first") - col("__prevLast") > gapS, 0L).otherwise(1L))
      .withColumn("__before",
        coalesce(sum(col("__n") - col("__m")).over(wsBefore), lit(0L)))
      .withColumn("__rowsBefore",
        coalesce(sum(col("__cnt")).over(wsBefore), lit(0L)))
      .select(u, col("__bkt"), (col("__before") - col("__m")).as("__off"),
        col("__rowsBefore"))
    // null-safe key equality: the plain window groups a NULL user into
    // one partition and keeps its rows; a null-rejecting equi-join
    // here would silently drop them (round-15 review). __bkt is
    // non-null by the tsCol contract; userCol may be null.
    val o = offsets.withColumnRenamed(userCol, "__ou")
      .withColumnRenamed("__bkt", "__obkt")
    local.join(o, local(userCol) <=> o("__ou") &&
        local("__bkt") === o("__obkt"))
      .withColumn("session_seq", col("__lseq") + col("__off"))
      .withColumn("__pos", col("__rn") + col("__rowsBefore"))
      .select(events.columns.map(col) ++
        Seq(col("session_seq"), col("__pos")): _*)
  }

  /** [[sessionize]] with data-driven shape selection: probe the
    * per-user volume ([[ShapeSelect.decide]]) and route to the plain
    * single-window shape on uniform keys or the two-phase
    * [[sessionizeBucketed]] when a hot entity is present. Output is
    * identical either way (the shapes are differential-pinned and
    * share one oracle), so the probe only ever trades the 1.4-2.1x
    * bucketed tax against the unbounded plain hot-key cliff — the
    * reason no static default is right at 100 TB.
    */
  def sessionizeAuto(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, orderCols: Seq[String],
      bucketSeconds: Long = 0L,
      shareThreshold: Double = ShapeSelect.DefaultShareThreshold,
      maxKeyRows: Long = ShapeSelect.DefaultMaxKeyRows,
      probeFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val d = ShapeSelect.decide(events, Seq(userCol), tsCol,
      shareThreshold, maxKeyRows, probeFraction, seed)
    if (d.bucketed)
      sessionizeBucketed(events, userCol, tsCol, gapMinutes, orderCols,
        bucketSeconds)
    else sessionize(events, userCol, tsCol, gapMinutes, orderCols)
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
      maxPrefix: Int = 50,
      bucketSeconds: Option[Long] = None,
      prefixChunkRows: Long = 65536L): DataFrame = {
    require(maxPrefix > 0, "maxPrefix must be > 0")
    bucketSeconds match {
      case None =>
        // plain shape: fine when no single (user, session) dominates
        val sess = sessionize(events, userCol, tsCol, gapMinutes, orderCols)
        val w = Window.partitionBy(col(userCol), col("session_seq"))
          .orderBy(orderCols.map(col): _*)
          .rowsBetween(-maxPrefix, -1)
        sess.withColumn("prefix", collect_list(col(idCol)).over(w))
          .where(size(col("prefix")) > 0)
          .select(col(userCol), col("session_seq"), col("prefix"),
            col(idCol).as("label"))
      case Some(b) =>
        // Hot-entity-safe shape. The x100 skew probe showed the plain
        // prefix window re-serializing after a bucketed sessionize: a
        // hot user's rerouted events collapse into ONE mega-session,
        // and partitionBy(user, session_seq) puts its whole timeline
        // back on one reducer. The bounded frame licenses chunking
        // instead: split each user's timeline at every
        // `prefixChunkRows`-th event (by the dense two-phase position,
        // never a per-user row_number), DUPLICATE only the last
        // `maxPrefix` rows of each chunk into the next as carry
        // context, and run the bounded window per (user, chunk) — no
        // partition ever exceeds chunk + maxPrefix rows, and the
        // carry amplification is maxPrefix/chunk (~0.1%). Chunk edges
        // need not align with session edges: the frame collects
        // (session_seq, id) structs and keeps same-session entries —
        // sessions are contiguous in the ordering, so the filtered
        // last-maxPrefix window IS the session-bounded prefix.
        require(prefixChunkRows > maxPrefix,
          s"prefixChunkRows ($prefixChunkRows) must exceed maxPrefix " +
            s"($maxPrefix) — carry rows must come from one chunk back")
        val sess = sessionizeBucketedWithPos(events, userCol, tsCol,
          gapMinutes, orderCols, b)
        val c = lit(prefixChunkRows)
        val zeroPos = col("__pos") - 1
        val base = sess
          .withColumn("__chunk", ((zeroPos - pmod(zeroPos, c)) / c)
            .cast("long"))
          .withColumn("__carry", lit(false))
        val carry = base
          .where(pmod(zeroPos, c) >= c - maxPrefix)
          .withColumn("__chunk", col("__chunk") + 1)
          .withColumn("__carry", lit(true))
        val w = Window.partitionBy(col(userCol), col("__chunk"))
          .orderBy(col("__pos"))
          .rowsBetween(-maxPrefix, -1)
        base.unionByName(carry)
          .withColumn("__pf", collect_list(
            struct(col("session_seq").as("s"), col(idCol).as("i"))).over(w))
          .where(!col("__carry"))
          .withColumn("prefix",
            expr("transform(filter(__pf, x -> x.s = session_seq), x -> x.i)"))
          .where(size(col("prefix")) > 0)
          .select(col(userCol), col("session_seq"), col("prefix"),
            col(idCol).as("label"))
    }
  }

  /** [[sessionPrefixes]] with data-driven shape selection: one
    * [[ShapeSelect.decide]] probe routes BOTH the embedded sessionize
    * and the prefix window — the two serialize on the same hot user,
    * so one verdict covers them (the x100 probe showed the prefix
    * window re-serializing even after a bucketed sessionize). Output
    * is identical on either route.
    */
  def sessionPrefixesAuto(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, gapMinutes: Int,
      orderCols: Seq[String], maxPrefix: Int = 50,
      bucketSeconds: Long = 0L, prefixChunkRows: Long = 65536L,
      shareThreshold: Double = ShapeSelect.DefaultShareThreshold,
      maxKeyRows: Long = ShapeSelect.DefaultMaxKeyRows,
      probeFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    val d = ShapeSelect.decide(events, Seq(userCol), tsCol,
      shareThreshold, maxKeyRows, probeFraction, seed)
    sessionPrefixes(events, userCol, tsCol, idCol, gapMinutes,
      orderCols, maxPrefix,
      // Some(0) = bucketed route with the operator's own 4x-gap
      // default span
      bucketSeconds = if (d.bucketed) Some(bucketSeconds) else None,
      prefixChunkRows = prefixChunkRows)
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

  /** SCD type-2 change history of one attribute from an event log:
    * consecutive rows with the SAME attribute value collapse (null-safe
    * lag compare), each surviving change opens a validity interval
    * [valid_from, valid_to) closed by the NEXT change's timestamp;
    * the last interval per key stays open (`valid_to` null,
    * `is_current` true). `tieCol` totalizes the ordering when
    * timestamps collide, so the history — including which of two
    * same-instant events wins — is deterministic and SQL-replayable
    * (lag/lead + IS DISTINCT FROM).
    *
    * Scale shape: two per-key window passes (the change filter, then
    * the interval close) — the same per-key-window family as
    * [[sessionize]]; for skewed keys apply the bucketed technique
    * exactly as there. No driver state, no joins.
    *
    * Output: (keyCol, attrCol, valid_from, valid_to, is_current).
    */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(!col("__prev").eqNullSafe(col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** Changelog compaction (CDC apply): materialize the current
    * snapshot of a keyed upsert/delete log — the LATEST entry per key
    * wins, and a key whose latest op equals `deleteOp` drops out of
    * the snapshot entirely. `seqCols` must totally order a key's
    * entries (e.g. (ts, event_id)); with ties the winner would be
    * partition-dependent.
    *
    * Scale shape: ONE `max_by` aggregate — the whole row rides as the
    * value, the seq tuple as the ordering key. max_by is
    * partial-aggregable, so each map task forwards one candidate row
    * per local key before the exchange; the shuffle carries O(distinct
    * keys) rows regardless of log depth. No window, so no per-key
    * timeline ever serializes on one reducer — this is the shape that
    * compacts a 100 TB changelog in a single bounded shuffle, where
    * the row_number()-over-key formulation sorts every key's full
    * history.
    *
    * Output: the log's columns minus `opCol`, one row per surviving
    * key.
    */
  /** Ordered funnel: per key, the earliest completion time of each
    * stage, where stage i must STRICTLY follow that key's stage-(i-1)
    * completion (same-instant events do not advance the funnel).
    * Keys that never complete stage 1 are absent; a key that stalls
    * at stage i carries nulls from t(i+1) on — the standard
    * conversion-funnel table.
    *
    * Scale shape: NO per-key window or timeline sort. Stage 1 is a
    * conditional min; each later stage joins the stage-i event slice
    * to the accumulator (one row per surviving key, O(keys)) and
    * takes another conditional min — `stages` key-partitioned
    * shuffles of ever-shrinking slices, each map-side combinable.
    * The projected event frame is pinned across the per-stage scans
    * (the [[Graph.pageRank]] consumer pattern).
    *
    * Output: (keyCol, t1 .. tN).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      cache: Option[org.apache.spark.storage.StorageLevel] = None)
      : DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val level = cache.getOrElse(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ev = events.select(col(keyCol).as("__k"),
        col(tsCol).as("__ts"), col(typeCol).as("__tp"))
      .where(col("__tp").isin(stages: _*)) // only funnel stages matter
      .persist(level)
    var acc = ev.where(col("__tp") === stages.head)
      .groupBy(col("__k")).agg(min(col("__ts")).as("t1"))
    for (i <- 2 to stages.length) {
      val nxt = ev.where(col("__tp") === stages(i - 1))
        .join(acc.select(col("__k"), col(s"t${i - 1}")), Seq("__k"))
        .where(col("__ts") > col(s"t${i - 1}"))
        .groupBy(col("__k")).agg(min(col("__ts")).as(s"t$i"))
      acc = acc.join(nxt, Seq("__k"), "left_outer")
    }
    val out = acc.withColumnRenamed("__k", keyCol).persist(level)
    out.count() // terminal action: materialize, then free the pin
    ev.unpersist(blocking = false)
    out
  }

  /** Time-series resampling with forward fill — align each key's
    * irregular event timeline to a regular `stepUs` grid, each grid
    * point carrying the payload of the latest event at or before it
    * (null before the key's first event only when the grid is aligned
    * below it). The temporal regularization pass a metrics/sensor/
    * feature pipeline runs before windowed training; Spark has no
    * built-in for it.
    *
    * Composition, not reimplementation: the grid is one
    * `sequence(alignedMin, max, step)` explosion off the per-key
    * bounds aggregate (grid length = span/step per key, caller-
    * bounded), and the fill is [[AsofJoin.asofBackward]] — the
    * union + window shape, ONE shuffle of (grid + events) per key,
    * no range join, with the bucketed twin available upstream for
    * hot keys. Pass `tieCol` when one key can hold several events at
    * the same instant (greatest tie wins, making the fill
    * deterministic).
    *
    * The guard aggregates the per-key grid size and REFUSES a grid
    * wider than `maxPointsPerKey` (a mis-chosen step over a years-long
    * span would explode the output silently); the guard is its own
    * narrow aggregation pass — set `maxPointsPerKey = 0` to skip it
    * when the span/step ratio is already known safe.
    *
    * @return one row per (key, grid instant): keyCols ++ tsCol (grid,
    *   long) ++ the right payload (valueCols and tieCol, forward-
    *   filled)
    */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], stepUs: Long,
      tieCol: Option[String] = None,
      maxPointsPerKey: Long = 100000L): DataFrame = {
    require(stepUs > 0, s"stepUs must be > 0, got $stepUs")
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "keys and value columns required")
    def bounds = df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol).cast("long")).as("__mn"),
        max(col(tsCol).cast("long")).as("__mx"))
    if (maxPointsPerKey > 0) {
      // span measured from the step-ALIGNED start (the grid's actual
      // first point, which sits at or below __mn), not from __mn —
      // otherwise the widest key's grid can exceed the bound by one
      val span = col("__mx") - (col("__mn") - pmod(col("__mn"),
        lit(stepUs)))
      val worst = bounds
        .agg(coalesce(max((span - pmod(span, lit(stepUs))) /
          lit(stepUs)), lit(0.0)))
        .collect()(0).getDouble(0).toLong + 1L
      require(worst <= maxPointsPerKey,
        s"resample grid would reach $worst points on the widest key " +
          s"(> maxPointsPerKey=$maxPointsPerKey); widen stepUs or " +
          "raise the bound deliberately")
    }
    val grid = bounds.select(keyCols.map(col) :+
      explode(sequence(
        col("__mn") - pmod(col("__mn"), lit(stepUs)),
        col("__mx"), lit(stepUs))).as(tsCol): _*)
    val right = df.select((keyCols.map(col) :+
      col(tsCol).cast("long").as(tsCol)) ++
      (valueCols ++ tieCol.toSeq).map(col): _*)
    AsofJoin.asofBackward(grid, right, keyCols, tsCol, tieCol)
  }

  /** Field-level survivorship merge — the MDM/golden-record rule
    * [[applyChangelog]]'s whole-row latest cannot express: for each
    * key, EVERY value column independently takes its latest NON-NULL
    * value (falling back to null only when the column is null across
    * the whole group). A record stream where different events carry
    * different subsets of fields collapses to one complete row per
    * key instead of the latest row's holes.
    *
    * Scale shape: ONE map-side-combinable aggregation — each column
    * is a `max_by(value, struct(value IS NOT NULL, seqCols...))`,
    * so the not-null flag (false < true) makes any filled value beat
    * every null one, and the sequence breaks ties among filled ones.
    * No window, no per-key sort; a million-row key costs its reducer
    * one running maximum per column. `seqCols` must totally order
    * rows within a key (include a unique id) or the winner among
    * equal-sequence filled values is undefined.
    *
    * @return one row per key: keyCols ++ valueCols (survivor values)
    */
  def survivorship(df: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty && valueCols.nonEmpty,
      "keys, seq, and value columns all required")
    val aggs = valueCols.map(c =>
      max_by(col(c),
        struct((col(c).isNotNull.as("__p") +:
          seqCols.map(col)): _*)).as(c))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def applyChangelog(log: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, deleteOp: String): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty, "keys and seq required")
    val payload = log.columns.filterNot(keyCols.contains).toSeq
    val latest = log
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(seqCols.map(col): _*)).as("__last"))
    payload.foldLeft(latest)((df, c) => df.withColumn(c, col(s"__last.$c")))
      .drop("__last")
      .where(col(opCol) =!= lit(deleteOp))
      .drop(opCol)
  }

  /** Full-changelog SCD2 history — [[applyChangelog]]'s sibling that
    * keeps EVERY version instead of compacting to the last, and
    * [[scd2]]'s sibling for CDC input (scd2 tracks ONE column's value
    * changes and collapses same-value runs; this preserves each
    * changelog row's whole payload and understands tombstones): each
    * non-delete changelog row becomes a history row whose validity
    * interval runs from its own sequence to the NEXT change of the
    * same key (`lead` per key in `seqCols` order; a delete row closes
    * its predecessor's interval and emits nothing). `seqCols` must
    * totally order each key's history (ties make `lead`
    * nondeterministic — same contract as [[applyChangelog]]); rows
    * with a NULL op drop, [[applyChangelog]]'s `=!=` convention.
    *
    * Scale shape: ONE shuffle (the per-key window partition); no
    * key's reducer sees more than that key's own history, and history
    * lengths are bounded by update frequency, not corpus size.
    *
    * @return log's columns minus `opCol`, plus `valid_from_<c>` /
    *   `valid_to_<c>` per seq column (to-side NULL on the current
    *   version) and `is_current`
    */
  def scd2History(log: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String,
      deleteOp: String): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty, "keys and seq required")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(col): _*)
    val withNext = log.withColumn("__next",
      lead(struct(seqCols.map(col): _*), 1).over(w))
    val out = seqCols.foldLeft(withNext) { (df, c) =>
      df.withColumn(s"valid_from_$c", col(c))
        .withColumn(s"valid_to_$c", col(s"__next.$c"))
    }
    out.withColumn("is_current", col("__next").isNull)
      .where(col(opCol) =!= lit(deleteOp))
      .drop("__next", opCol)
  }

  /** Cohort retention matrix — the product-analytics staple: users
    * bucketed by their FIRST activity period (the cohort), then
    * counted in every later period they were active, as
    * (cohort, period_offset, n_users). Periods are epoch-microsecond
    * buckets of `bucketMicros` (default weekly), pure integer
    * arithmetic an external engine replays exactly. NULL users
    * (anonymous events) are excluded.
    *
    * Scale shape: three map-side-combinable aggregations — the
    * per-user first-bucket min, the distinct (user, bucket) activity
    * set, and the final (cohort, offset) rollup — joined once on the
    * user key; no window, no per-user history materialization. The
    * output is bounded by periods^2, metadata scale.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String = "ts",
      bucketMicros: Long = 7L * 86400 * 1000000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros > 0, got $bucketMicros")
    val e = events
      .select(col(userCol).as("u"), tsMicros(events, tsCol).as("__us"))
      .where(col("u").isNotNull)
      .select(col("u"), expr(s"__us div $bucketMicros").as("b"))
    val cohorts = e.groupBy("u").agg(min("b").as("cohort"))
    e.distinct()
      .join(cohorts, "u")
      .groupBy(col("cohort"), (col("b") - col("cohort"))
        .as("period_offset"))
      // the joined frame is distinct per (u, b), so count(*) counts
      // USERS — no count_distinct shuffle needed
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over each key's
    * time-ordered state sequence: counts and row-normalized
    * probabilities of state -> next-state steps — the
    * sequence-modeling summary (next-event prediction priors, funnel
    * leak maps) read straight off the event log.
    *
    * One shuffle on the key for the lag window, one (state, next)
    * count aggregation with map-side combine; output is
    * state-alphabet², not log-sized. Probabilities are exact-count
    * IEEE ratios, bit-identical on any engine.
    *
    * @param orderCols total per-key order (e.g. ts then event id) —
    *                  must be tie-free or the lag is nondeterministic.
    * @return (state, next_state, n, p) ordered by (state, next_state),
    *         p = n / outgoing transitions FROM state, 6-decimal.
    */
  def transitionMatrix(events: DataFrame, keyCol: String,
      orderCols: Seq[String], stateCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val steps = events
      .where(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(stateCol).as("state"), col("__next").as("next_state"))
      .agg(count(lit(1)).as("n"))
    val outTotals = steps.groupBy("state").agg(sum("n").as("n_out"))
    steps.join(outTotals, Seq("state"))
      .select(col("state"), col("next_state"), col("n"),
        round(col("n").cast("double") / col("n_out").cast("double"), 6)
          .as("p"))
      .orderBy("state", "next_state")
  }

  /** Skip-gram (center, context) pair counts over each key's
    * time-ordered item sequence — the embedding-training data prep
    * (item2vec / word2vec-style) read off interaction logs: every
    * ordered pair within `window` positions, both directions, counted.
    *
    * Implemented as ONE window pass with `window` lead columns
    * (posexplode'd), not a positional self-join — the fan-out is
    * exactly `window` rows per input row before the count
    * aggregation, and the only shuffles are the key-order window and
    * the (center, context) count. `orderCols` must be tie-free or
    * have payload-equal ties (include the item column).
    *
    * @return (center, context, n) ordered by (center, context, n
    *         implied unique); symmetric — n(a,b) == n(b,a).
    */
  def skipGramPairs(df: DataFrame, keyCol: String,
      orderCols: Seq[String], itemCol: String, window: Int)
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    // window exprs first, THEN the generator — Spark cannot evaluate a
    // generator over window functions in one projection
    val withLeads = (1 to window).foldLeft(
      df.where(col(keyCol).isNotNull && col(itemCol).isNotNull)) {
      case (d, i) => d.withColumn(s"__l$i", lead(col(itemCol), i).over(w))
    }
    val pairs = withLeads
      .withColumn("__ctx",
        explode(array((1 to window).map(i => col(s"__l$i")): _*)))
      .where(col("__ctx").isNotNull)
      .select(col(itemCol).as("a"), col("__ctx").as("b"))
    pairs.select(col("a").as("center"), col("b").as("context"))
      .unionAll(pairs.select(col("b").as("center"), col("a").as("context")))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n"))
      .orderBy("center", "context")
  }

  /** Trailing-window spike detection over a keyed time series: each
    * point is compared against the mean/stddev of its own previous
    * `base` points — the metric-anomaly gate (traffic spikes, error
    * bursts) that needs no global model. Baselines are exact decimal
    * frame sums with mean/variance derived in IEEE; a point with
    * fewer than `minBase` predecessors reports null (insufficient
    * history), a zero-variance baseline flags any deviation.
    *
    * One key-partitioned ordered window (two decimal frame sums + a
    * count, all in the same frame); nothing else touches the series.
    *
    * @return input plus (base_n, base_mean, z, spike); z 6-decimal,
    *         null when sd == 0 or history short; spike null when
    *         history short.
    */
  def spikes(series: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, base: Int, k: Double = 3.0,
      minBase: Int = 3): DataFrame = {
    require(base >= minBase && minBase >= 2,
      s"need base >= minBase >= 2, got base=$base minBase=$minBase")
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-base, -1)
    val y = col(valueCol).cast("decimal(18,6)")
    val withBase = series
      .withColumn("base_n", count(y).over(frame))
      .withColumn("__s", sum(y).over(frame))
      .withColumn("__ss", sum(y * y).over(frame))
    val meanC = col("__s").cast("double") / col("base_n").cast("double")
    // population variance of the baseline window
    val varC = (col("__ss").cast("double") -
      col("__s").cast("double") * col("__s").cast("double") /
        col("base_n").cast("double")) / col("base_n").cast("double")
    val sdC = sqrt(varC)
    val dev = col(valueCol).cast("double") - meanC
    withBase
      .withColumn("base_mean",
        when(col("base_n") >= minBase, round(meanC, 6)))
      .withColumn("z", when(col("base_n") >= minBase && sdC > 0.0,
        round(dev / sdC, 6)))
      .withColumn("spike", when(col("base_n") >= minBase,
        when(sdC > 0.0, abs(dev / sdC) > lit(k))
          .otherwise(dev =!= 0.0)))
      .drop("__s", "__ss")
  }

  /** Hot-key-safe form of [[transitionMatrix]]: OUTPUT-IDENTICAL
    * (same oracle), but no reducer ever sorts one key's whole
    * timeline — the [[sessionizeBucketed]] discipline applied to
    * adjacent-pair extraction.
    *
    * MEASURED trade (BENCH_SKEW_TRANSITIONS_r20.json): unlike the
    * sessionize/prefix windows (which carry per-row state and lose
    * 2-3x on a 14% hot key at x100), a transition LEAD is one string
    * per row — cheap enough that the plain form stays 4x FASTER even
    * at x100 with the planted hot key. Prefer [[transitionMatrix]]
    * unless a single key's timeline exceeds the executor sort/spill
    * budget (order 1e8+ events per key); this form is the documented
    * escape hatch for exactly that regime, not a default.
    *
    * Two phases: (1) within-bucket lead pairs under a (key, time
    * bucket) window, so the sort unit is one key's one bucket;
    * (2) boundary pairs from a per-(key, bucket) aggregate table
    * (first/last state via struct min/max — map-side combinable)
    * joined to the NEXT OCCUPIED bucket with a lead over that compact
    * per-bucket table (rows = occupied buckets, not events — empty
    * buckets in between are skipped correctly). A 14%-hot key costs
    * its share of buckets, never one reducer.
    *
    * @param tsCol     numeric (e.g. epoch-micros) primary order column
    *                  — the bucketing key.
    * @param tieCols   trailing order columns making (ts, ties)
    *                  tie-free per key.
    */
  def transitionMatrixBucketed(events: DataFrame, keyCol: String,
      tsCol: String, tieCols: Seq[String], stateCol: String,
      bucketMicros: Long = 3600L * 1000000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros > 0, got $bucketMicros")
    val base = events
      .where(col(keyCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__b", expr(s"$tsCol div ${bucketMicros}L"))
    val ord = (col(tsCol) +: tieCols.map(col))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__b")).orderBy(ord: _*)
    val within = base
      .withColumn("__next", lead(col(stateCol), 1).over(wIn))
      .where(col("__next").isNotNull)
      .select(col(stateCol).as("state"), col("__next").as("next_state"))
    // per-(key, occupied-bucket) first/last over the total struct
    // order (ts, ties..., state) — state rides along, never compared
    // first
    val orderedStruct = struct(ord :+ col(stateCol).as("__st"): _*)
    val perBucket = base
      .groupBy(col(keyCol), col("__b"))
      .agg(min(orderedStruct).getField("__st").as("__first"),
        max(orderedStruct).getField("__st").as("__last"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__b"))
    val boundary = perBucket
      .withColumn("__nextFirst", lead(col("__first"), 1).over(wB))
      .where(col("__nextFirst").isNotNull)
      .select(col("__last").as("state"),
        col("__nextFirst").as("next_state"))
    val steps = within.unionByName(boundary)
      .groupBy("state", "next_state").agg(count(lit(1)).as("n"))
    val outTotals = steps.groupBy("state").agg(sum("n").as("n_out"))
    steps.join(outTotals, Seq("state"))
      .select(col("state"), col("next_state"), col("n"),
        round(col("n").cast("double") / col("n_out").cast("double"), 6)
          .as("p"))
      .orderBy("state", "next_state")
  }

  /** Kaplan-Meier survival estimate over right-censored durations —
    * time-to-churn / time-to-conversion curves from observational
    * logs where many subjects simply haven't "died" yet.
    *
    * At each distinct duration t (ascending): n_risk = subjects with
    * duration >= t, d = observed events at t, c = censored exits at
    * t; the survival estimate multiplies (1 - d/n_risk) over all
    * event times <= t. The product is computed as
    * exp(Σ ln(1 - d/n)) with each log term rounded to 12 decimals
    * before the exact decimal running sum — the factors are IEEE
    * ratios of exact counts, so the curve is engine-reproducible; a
    * step where d = n_risk drives survival exactly to 0 from there on
    * (guarded, no ln(0)).
    *
    * Scale note: the per-duration grid (the only windowed frame) is
    * distinct-duration-sized, not subject-sized — the subject table
    * is touched by one grouping aggregation. The running window is a
    * single ordered pass over that grid.
    *
    * @param durations one row per subject: duration (numeric) +
    *                  observed flag (true = event, false = censored).
    * @return (duration, n_risk, d, c, survival) ordered by duration,
    *         survival 6-decimal.
    */
  def kaplanMeier(durations: DataFrame, durationCol: String,
      observedCol: String): DataFrame = {
    val grid = durations
      .where(col(durationCol).isNotNull && col(observedCol).isNotNull)
      .groupBy(col(durationCol).as("duration"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("duration"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val withRisk = grid
      .withColumn("__exited_thru",
        sum(col("d") + col("c")).over(ord))
      .withColumn("__total",
        sum(col("d") + col("c")).over(org.apache.spark.sql.expressions
          .Window.partitionBy(lit(1))))
      .withColumn("n_risk",
        col("__total") - col("__exited_thru") + col("d") + col("c"))
    withRisk
      .withColumn("__dead",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
          .over(ord))
      .withColumn("__lnsum",
        sum(when(col("d") < col("n_risk"),
            round(log(lit(1.0) - col("d").cast("double") /
              col("n_risk").cast("double")), 12))
          .otherwise(lit(0.0)).cast("decimal(28,12)")).over(ord))
      .select(col("duration"), col("n_risk"), col("d"), col("c"),
        when(col("__dead") === 1L, lit(0.0))
          .otherwise(round(exp(col("__lnsum").cast("double")), 6))
          .as("survival"))
      .orderBy("duration")
  }
}
