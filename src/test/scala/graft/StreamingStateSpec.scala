package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.Events
import graft.streaming.{DriftMonitor, SessionEvent, Sessionizer}

/** Streaming state-SIZE measurements (VERDICT r14 item 5): the
  * "state is O(users)" / "state is O(windows x bins)" claims for
  * [[Sessionizer]] and [[DriftMonitor.windowedBins]] had no recorded
  * numbers — these specs pin them with the state-store metrics
  * Structured Streaming itself reports (`stateOperators.numRowsTotal`
  * per progress event), on the REAL events table at two data scales.
  * A 10x-data run must grow state rows exactly with the distinct-user
  * (resp. occupied window-bin) count — never with event count — or the
  * 100 TB story is wrong no matter what the wall-clock says.
  */
class StreamingStateSpec extends SparkSpec {
  import spark.implicits._

  /** Peak and final `numRowsTotal` across the run's progress events,
    * plus peak state memory, for one AvailableNow query.
    */
  private def runAndMeasure(build: String => org.apache.spark.sql.streaming
      .DataStreamWriter[_], dir: String): (Long, Long, Long) = {
    val q = build(dir).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
    val mem = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.memoryUsedBytes))
    assert(rows.nonEmpty, "no state-operator progress recorded")
    (rows.max, rows.last, mem.max)
  }

  /** Events of `sfDir` as (user_id, ts, event_id) with a far-future
    * sentinel in a second file: file 1 carries every real event, file
    * 2's sentinel advances the watermark so the trailing no-data batch
    * event-time-times-out all real state (the q_sessionize_stream
    * construction).
    */
  private def stageEvents(sfDir: String, dir: String): Unit = {
    val rawEv = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = rawEv.select(col("user_id"),
      timestamp_micros(Events.tsMicros(rawEv)).as("ts"),
      col("event_id"), floor(col("value")).cast("long").as("v"))
    ev.write.mode("overwrite").json(s"$dir/in/f1")
    val maxUs = rawEv.agg(max(Events.tsMicros(rawEv))).head().getLong(0)
    spark.range(1).select(lit(-1L).as("user_id"),
        timestamp_micros(lit(maxUs + 2L * 86400 * 1000000)).as("ts"),
        lit(-1L).as("event_id"), lit(0L).as("v"))
      .write.mode("overwrite").json(s"$dir/in/f2")
  }

  private val schema = StructType(Seq(StructField("user_id", LongType),
    StructField("ts", TimestampType), StructField("event_id", LongType),
    StructField("v", LongType)))

  /** Sessionizer state must peak at exactly (distinct users + 1
    * sentinel) open sessions — O(users) — and drain to the single
    * still-open sentinel session after the timeout cleanup batch.
    */
  private def checkSessionizerState(sfDir: String): Unit = {
    val dir = tmpDir("state-sess")
    stageEvents(sfDir, dir)
    val nUsers = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    val (peak, fin, memPeak) = runAndMeasure(d =>
      Sessionizer.sessionize(
          spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1").json(s"$d/in")
            .withWatermark("ts", "1 second")
            .select(col("user_id").as("userId"), col("ts"),
              col("ts").cast("long").as("tsSec"),
              col("event_id").as("eventId"))
            .as[SessionEvent], gapSeconds = 1800)
          .toDF()
          .writeStream.format("noop")
          .outputMode("append")
          .option("checkpointLocation", s"$d/ckpt"),
      dir)
    info(s"sessionizer @$sfDir: users=$nUsers events=$nEvents " +
      s"peakStateRows=$peak finalStateRows=$fin peakStateMB=" +
      f"${memPeak / 1048576.0}%.1f")
    // peak = batch 1 (all real events): every user's one open session;
    // the sentinel's own session only enters state in batch 2, after
    // the advanced watermark has already begun timing real sessions out
    assert(peak == nUsers,
      s"state rows $peak != distinct users $nUsers — state is not O(users)")
    assert(peak < nEvents, "state grew with events, not users")
    // cleanup batch drained all real sessions; only the sentinel stays open
    assert(fin == 1, s"final state $fin != 1 — timeout cleanup left state behind")
  }

  /** DriftMonitor state must peak at exactly the occupied
    * (window, bin) group count — O(windows x bins) — and drain to the
    * sentinel's single group once the real windows close.
    */
  private def checkDriftState(sfDir: String): Unit = {
    val dir = tmpDir("state-drift")
    stageEvents(sfDir, dir)
    val evB = spark.read.json(s"$dir/in/f1")
    val mm = evB.agg(min("v"), max("v")).head()
    val mn = mm.getLong(0)
    val w = (mm.getLong(1) - mn) / 8 + 1
    // the exact occupied (2-day window, bin) population, from batch SQL
    val expectGroups = evB.select(
        window(col("ts").cast("timestamp"), "2 days").as("win"),
        expr(s"(v - ${mn}L) div ${w}L").as("bin"))
      .distinct().count()
    val nEvents = evB.count()
    val (peak, fin, memPeak) = runAndMeasure(d =>
      DriftMonitor.windowedBins(
          spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1").json(s"$d/in"),
          "ts", "v", "2 days", "0 seconds", mn, w)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$d/ckpt"),
      dir)
    info(s"drift @$sfDir: occupiedWindowBins=$expectGroups " +
      s"events=$nEvents peakStateRows=$peak finalStateRows=$fin " +
      f"peakStateMB=${memPeak / 1048576.0}%.1f")
    assert(peak == expectGroups,
      s"state rows $peak != occupied window-bins $expectGroups — " +
        "state is not O(windows x bins)")
    assert(peak < nEvents, "state grew with events, not windows x bins")
    // all real windows closed and evicted; the sentinel's stays open
    assert(fin == 1, s"final state $fin != 1 — closed windows not evicted")
  }

  test("sessionizer state is O(users) at sf0.01") {
    checkSessionizerState("/root/testdata/sf0.01")
  }

  test("sessionizer state is O(users) at sf0.1 (10x events)") {
    checkSessionizerState("/root/testdata/sf0.1")
  }

  test("drift monitor state is O(windows x bins) at sf0.01") {
    checkDriftState("/root/testdata/sf0.01")
  }

  test("drift monitor state is O(windows x bins) at sf0.1 (10x events)") {
    checkDriftState("/root/testdata/sf0.1")
  }

  /** Stage a scaled events fixture when absent (VERDICT r17
    * what's-wrong #3: these specs used to `assume`-cancel on a fresh
    * box, so the x100 streaming-state evidence silently never ran —
    * the gate must be real every session). Events only: that is the
    * one table the streaming checks read, and it skips the scaler's
    * 60M-row lineitem rewrite.
    */
  private def ensureStaged(dst: String, factor: Int, mode: String): Unit =
    if (!new java.io.File(s"$dst/events.parquet").exists()) {
      info(s"staging $dst: events x$factor ($mode) via StressScale")
      StressScale.run(spark, "/root/testdata/sf0.1", dst, factor, mode,
        Some(Set("events")))
    }

  /** Streaming MinHash near-dup state must peak at exactly the
    * DISTINCT band-key population of the corpus — O(active bands),
    * never O(documents x bands) or O(documents) — and drain to the
    * sentinel's own bands once the watermark times the real bands
    * out. The expected count comes from the identical batch band
    * expressions, so the pin is exact, not a bound.
    */
  private def checkMinhashState(sfDir: String): Unit = {
    import graft.functions.{HashFunctions => H, TextFunctions => T}
    import graft.streaming.StreamingDedup
    val dir = tmpDir("state-minhash")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.withColumn("ts",
        lit("2024-01-01 00:00:00").cast("timestamp"))
      .write.mode("overwrite").json(s"$dir/in/f1")
    // far-future sentinel: its arrival advances the watermark so the
    // trailing no-data batch event-time-times-out every real band
    spark.range(1).select(lit(-1L).as("doc_id"),
        lit("2024-06-01 00:00:00").cast("timestamp").as("ts"),
        lit("sentinel").as("text"))
      .write.mode("overwrite").json(s"$dir/in/f2")
    def bandsOf(df: org.apache.spark.sql.DataFrame) = df.select(
      explode(H.bandKeys(H.minhashSignature(
        H.wordShingles(T.tokens(col("text")), 3), 32), 16, 2)).as("b"))
    val expectBands = bandsOf(docs).distinct().count()
    val sentinelBands = bandsOf(Seq("sentinel").toDF("text"))
      .distinct().count()
    val nDocs = docs.count()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val (peak, fin, memPeak) = runAndMeasure(d =>
      StreamingDedup.nearDupByMinhash(
          spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1").json(s"$d/in")
            .withWatermark("ts", "1 hour"),
          "doc_id", "text", "ts", ttlMs = 3600000L)
        .toDF()
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$d/ckpt"),
      dir)
    info(s"minhash @$sfDir: docs=$nDocs distinctBands=$expectBands " +
      s"peakStateRows=$peak finalStateRows=$fin peakStateMB=" +
      f"${memPeak / 1048576.0}%.1f")
    // batch 1 holds every real doc: one state row per DISTINCT band
    assert(peak == expectBands || peak == expectBands + sentinelBands,
      s"state rows $peak != distinct bands $expectBands (+sentinel " +
        s"$sentinelBands) — state is not O(active bands)")
    // cleanup drained all real bands; only the sentinel's remain
    assert(fin == sentinelBands,
      s"final state $fin != sentinel bands $sentinelBands — " +
        "timed-out bands not reclaimed")
  }

  test("streaming minhash state is O(distinct bands) at sf0.01") {
    checkMinhashState("/root/testdata/sf0.01")
  }

  test("streaming minhash state is O(distinct bands) at sf0.1 (10x docs)") {
    checkMinhashState("/root/testdata/sf0.1")
  }

  test("sessionizer state stays O(users) at sf1 (10x events)") {
    ensureStaged("/tmp/graft-sf1", 10, "uniform")
    checkSessionizerState("/tmp/graft-sf1")
  }

  /** VERDICT r15 item 6: the O(users) pin at the x100-events scale the
    * batch skew probes use (10M events), on the SKEW fixture — a 14%
    * single-user hot spot. Per-user state is the one place a hot key
    * CANNOT inflate anything: the hot user is still one state row, so
    * peak must equal distinct users exactly, same as uniform keys. The
    * recorded info line (state rows + peak state memory) is the
    * evidence PLANS.md cites.
    */
  test("sessionizer state stays O(users) at x100 events, 14% hot user") {
    ensureStaged("/tmp/graft-sf10-events", 100, "skew")
    checkSessionizerState("/tmp/graft-sf10-events")
  }

  /** Same x100 rung for the drift monitor: occupied (window, bin)
    * groups — the expected count is recomputed from the fixture by
    * batch SQL, so the pin holds whatever time range the scaled
    * replicas span.
    */
  test("drift monitor state is O(windows x bins) at x100 events") {
    ensureStaged("/tmp/graft-sf10-events", 100, "skew")
    checkDriftState("/tmp/graft-sf10-events")
  }
}
