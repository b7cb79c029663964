package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Events

/** The events.ts ingestion contract: the testdata generator has shipped
  * `events.parquet` both as TIMESTAMP(NANOS) — which Spark surfaces as a
  * nanosecond long under `spark.sql.legacy.parquet.nanosAsLong` — and as
  * `timestamp[us]` — which Spark surfaces as TIMESTAMP_NTZ (or TIMESTAMP
  * when the writer flagged UTC adjustment). Every events query funnels
  * through [[Events.tsMicros]]; this spec pins that all three physical
  * encodings of the SAME instants produce byte-identical query output
  * (the round-13 regression class: a hard-coded `ts div 1000` that was
  * only valid for one encoding).
  */
class EventTimeEncodingSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, us-epoch, user, type, value) — two users, gaps that
    * straddle the 30-min sessionize boundary and the 60s dedup window,
    * plus view/purchase interleavings for the as-of join.
    */
  private val baseUs: Seq[(Long, Long, Long, String, Double)] = {
    val t0 = 1700000000000000L // 2023-11-14 22:13:20 UTC, microseconds
    Seq(
      (1L, t0,                 1L, "view",     1.5),
      (2L, t0 +      30000000L, 1L, "view",     2.0), // +30s (dedup window)
      (3L, t0 +     120000000L, 1L, "purchase", 9.0), // +2m
      (4L, t0 + 40L * 60000000L, 1L, "view",    0.5), // +40m: new session
      (5L, t0 + 41L * 60000000L, 1L, "purchase", 7.25),
      (6L, t0 +       5000000L, 2L, "view",     3.0),
      (7L, t0 + 90L * 60000000L, 2L, "purchase", 4.0))
  }

  /** Writes the fixture under `dir/events.parquet` with `ts` in the
    * given physical encoding; returns the read-back ts dataType.
    */
  private def writeEncoded(dir: String, enc: String): DataType = {
    val df = baseUs.toDF("event_id", "ts_us", "user_id", "event_type",
        "value")
      .withColumn("props", lit("{}"))
    val out = enc match {
      case "ns-long" => df.withColumn("ts", col("ts_us") * 1000L)
      case "ts-utc"  => df.withColumn("ts", timestamp_micros(col("ts_us")))
      case "ts-ntz"  => df.withColumn("ts",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    }
    out.drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  private val encodings = Seq("ns-long", "ts-utc", "ts-ntz")

  private lazy val dirs: Map[String, String] = encodings.map { e =>
    val d = tmpDir(s"enc-$e")
    val dt = writeEncoded(d, e)
    val expected = e match {
      case "ns-long" => LongType
      case "ts-utc"  => TimestampType
      case "ts-ntz"  => TimestampNTZType
    }
    assert(dt == expected, s"encoding $e surfaced as $dt")
    e -> d
  }.toMap

  test("tsMicros recovers identical us epochs from all three encodings") {
    val expected = baseUs.map(_._2).sorted
    for (e <- encodings) {
      val ev = spark.read.parquet(s"${dirs(e)}/events.parquet")
      val got = ev.select(Events.tsMicros(ev).as("us"))
        .as[Long].collect().sorted.toSeq
      assert(got == expected, s"encoding $e")
    }
  }

  test("tsMicros: 200 random epochs agree across encodings (seeded)") {
    // covers epochs the fixture doesn't: pre-1970 negatives, sub-us ns
    // remainders (truncated identically by the ns-long path and by a
    // generator's ns->us cast), and the us-grid corners
    val rnd = new scala.util.Random(20260813L)
    val epochs = Seq(0L, -1L, 999999L, -999999L, 1L) ++
      Seq.fill(195)(rnd.between(-4102444800000000L, 4102444800000000L))
    val d = tmpDir("enc-prop")
    val base = epochs.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "ts_us")
    base.select(col("event_id"), (col("ts_us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$d/ns/events.parquet")
    base.select(col("event_id"),
        timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$d/ntz/events.parquet")
    def read(sub: String): Map[Long, Long] = {
      val ev = spark.read.parquet(s"$d/$sub/events.parquet")
      ev.select(col("event_id"), Events.tsMicros(ev).as("us"))
        .as[(Long, Long)].collect().toMap
    }
    val (ns, ntz) = (read("ns"), read("ntz"))
    val expected = epochs.zipWithIndex.map { case (us, i) =>
      i.toLong -> us
    }.toMap
    assert(ntz == expected)
    // exact-us instants: ns div 1000 has no remainder, so truncating
    // integral division agrees with the us value for negatives too
    assert(ns == expected)
  }

  test("tsMicros refuses a non-time column") {
    val ev = spark.read.parquet(s"${dirs("ns-long")}/events.parquet")
    val ex = intercept[IllegalArgumentException] {
      Events.tsMicros(ev, "event_type")
    }
    assert(ex.getMessage.contains("event_type"))
  }

  /** The three repaired query shapes that cover every normalizer call
    * pattern: tstamp reconstruction (eventsWindow), us+floor-seconds
    * (sessionize), us-only (asofJoin).
    */
  private val queryShapes: Seq[(String, (org.apache.spark.sql.SparkSession,
      String) => DataFrame)] = Seq(
    "eventsWindow" -> (Queries.eventsWindow _),
    "sessionize"   -> (Queries.sessionize _),
    "asofJoin"     -> (Queries.asofJoin _))

  for ((qn, fn) <- queryShapes)
    test(s"$qn is encoding-invariant") {
      val results = encodings.map { e =>
        e -> fn(spark, dirs(e)).collect().map(_.toString).toSeq
      }
      val (refEnc, ref) = results.head
      assert(ref.nonEmpty, s"$qn returned no rows")
      for ((e, got) <- results.tail)
        assert(got == ref, s"$qn: $e differs from $refEnc")
    }
}
