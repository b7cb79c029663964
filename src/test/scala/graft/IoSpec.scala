package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.{Bucketing, Readers, StateTable, Writers}
import graft.schema.Schemas

/** Source/sink specs (SURVEY.md §2.1-§2.2): schema backfill, codec
  * transparency, existence gating, run-time-partitioned layout.
  */
class IoSpec extends SparkSpec {
  import spark.implicits._

  test("withBackfill adds missing top-level and nested columns as nulls") {
    val df = Seq("1").toDF("x")
      .select(struct(col("x").as("itemId")).as("input"))
    val out = Readers.withBackfill(df, Schemas.relatedItemsBatchInference)
    // names+types must match exactly; nullability may tighten
    assert(out.schema.simpleString ==
      Schemas.relatedItemsBatchInference.simpleString)
    val r = out.collect().head
    assert(r.getStruct(0) == org.apache.spark.sql.Row("1"))
    assert(r.isNullAt(1) || r.getStruct(1).isNullAt(0)) // output backfilled
    assert(r.isNullAt(2))                               // error backfilled
  }

  test("withBackfill keeps present nested fields and drops extras") {
    val df = Seq(("1", "keep", "extra")).toDF("a", "b", "c")
      .select(struct(col("a").as("itemId"), col("c").as("junk")).as("input"),
        col("b").as("error"))
    val out = Readers.withBackfill(df, Schemas.relatedItemsBatchInference)
    assert(out.select("input.itemId").as[String].collect().head == "1")
    assert(out.select("input.*").columns.toSeq == Seq("itemId"))
  }

  test("jsonl reads gzip transparently and recursively") {
    val dir = tmpDir("gz")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.mode("overwrite").option("compression", "gzip")
      .json(s"$dir/nested/deeper")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val out = Readers.jsonl(spark, dir, schema)
    assert(out.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("jsonl multiLine mode reads pretty-printed JSON documents") {
    val dir = tmpDir("multiline")
    // A pretty-printed array document — the shape that, read line-
    // delimited, comes back as corrupt-record rows.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/batch.json"),
      """[
        |  { "k": 1,
        |    "v": "a" },
        |  { "k": 2,
        |    "v": "b" }
        |]""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    val out = Readers.jsonl(spark, dir, schema, multiLine = true)
    assert(out.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // default line-delimited read of the same file yields no usable rows
    val broken = Readers.jsonl(spark, dir, schema)
    assert(broken.where(col("k").isNotNull).count() == 0)
  }

  test("inferred read unions ragged field types across files to string") {
    val dir = tmpDir("ragged")
    // Same field, different JSON types per file (Glue "choice type"):
    // price is a number in one batch and a string in another.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part1.json"),
      """{"id":"p1","price":9.99}""".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part2.json"),
      """{"id":"p2","price":"19.50"}""".getBytes("UTF-8"))
    val out = Readers.jsonlInferIfExists(spark, dir).get
    assert(out.schema("price").dataType == StringType) // unioned, not lost
    assert(out.orderBy("id").select("price").as[String].collect().toSeq ==
      Seq("9.99", "19.50"))
  }

  test("jsonlIfExists gates on path existence") {
    val dir = tmpDir("gate")
    val schema = StructType(Seq(StructField("k", LongType)))
    assert(Readers.jsonlIfExists(spark, s"$dir/nope", schema).isEmpty)
    Seq(1L).toDF("k").write.mode("overwrite").json(s"$dir/yes")
    assert(Readers.jsonlIfExists(spark, s"$dir/yes", schema).isDefined)
  }

  test("csv reads header/quoted files with explicit schema") {
    val dir = tmpDir("csv")
    Seq(("u,1", "i\"2")).toDF("USER_ID", "ITEM_ID")
      .write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(dir)
    val out = Readers.csv(spark, dir, Schemas.userItemMapping).collect().head
    assert(out.getString(0) == "u,1" && out.getString(1) == "i\"2")
  }

  test("connectorOutput writes the run-time-partitioned layout") {
    val dir = tmpDir("sink")
    val clock = LocalDateTime.of(2024, 3, 7, 14, 5, 9)
    val written = Writers.connectorOutput(Seq(1L).toDF("k"), dir, "braze",
      clock)
    assert(written ==
      s"$dir/braze/year=2024/month=03/day=07/time=140509")
    assert(spark.read.json(written).count() == 1)
  }

  test("errors sink writes only when enabled and non-empty") {
    val dir = tmpDir("err")
    val clock = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val empty = Seq.empty[Long].toDF("k")
    val some = Seq(1L).toDF("k")
    assert(Writers.errors(empty, dir, "ri", clock, enabled = true).isEmpty)
    assert(Writers.errors(some, dir, "ri", clock, enabled = false).isEmpty)
    assert(Writers.errors(some, dir, "ri", clock, enabled = true).isDefined)
  }

  test("idempotentConnectorOutput collapses in-batch key twins") {
    val dir = tmpDir("idem-twins")
    val clock = LocalDateTime.of(2024, 5, 1, 0, 0, 0)
    // key 1 appears twice WITHIN the first batch; only one delivery
    // may reach the output (ADVICE r10 — the manifest alone cannot
    // absorb twins inside the batch it is about to record)
    val batch = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val fresh = Writers.idempotentConnectorOutput(batch, s"$dir/out",
      "conn", clock, Seq("k"), s"$dir/manifest")
    try assert(fresh.count() == 2) finally fresh.unpersist()
    val delivered = spark.read.option("recursiveFileLookup", "true")
      .json(s"$dir/out/conn")
    assert(delivered.count() == 2)
    assert(delivered.groupBy("k").count()
      .where(col("count") > 1).isEmpty)
    // and the cross-batch replay path still holds
    val replay = Writers.idempotentConnectorOutput(batch, s"$dir/out",
      "conn", clock.plusHours(1), Seq("k"), s"$dir/manifest")
    try assert(replay.isEmpty) finally replay.unpersist()
  }

  test("StateTable.append: interleaved concurrent appends lose nothing") {
    // two writers, 8 appends each, racing for version slots — the
    // claim protocol must serialize them into 16 DISTINCT versions
    // with every key batch surviving (the reference allows
    // MaxConcurrentRuns: 2; the old errorifexists write could
    // interleave two writers' files into one v=N dir). BOTH claim
    // stores carry the same contract: the atomic-rename CAS and the
    // conditional-put marker protocol (VERDICT r15 #4 — the raw-S3
    // path, simulated here by its local primitive, O_EXCL create).
    import java.util.concurrent.Executors
    for ((claim, tag) <- Seq(
        (StateTable.RenameClaim, "rename"),
        (StateTable.ConditionalPutClaim, "condput"))) {
      val dir = tmpDir(s"state-cas-$tag")
      val pool = Executors.newFixedThreadPool(2)
      try {
        val futs = (0 until 2).map { w =>
          pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
            def call(): Seq[Int] = (0 until 8).map { i =>
              StateTable.append(
                Seq((w * 1000L + i, s"w$w-b$i")).toDF("k", "val"), dir,
                claim)
            }
          })
        }
        val claimed = futs.flatMap(_.get())
        assert(claimed.distinct.size == 16,
          s"[$tag] version collision: $claimed")
        assert(StateTable.versions(spark, dir) == claimed.sorted)
        val state = StateTable.readLatest(spark, dir, Seq("k"))
        assert(state.count() == 16) // no lost update, no duplicated key
        assert(state.select("k").distinct().count() == 16)
      } finally pool.shutdown()
    }
    // crashed-winner plant (ADVICE r16): a marker with NO data dir is
    // what a winner that died between claim and publish leaves. Past
    // the TTL the janitor in append's retry path must reclaim the
    // slot — the next append lands at the PLANTED version, not past a
    // permanent hole; before the TTL the marker is an active lease
    // and the version is skipped (the old, still-safe behavior).
    locally {
      import org.apache.hadoop.fs.Path
      val dir = tmpDir("state-cas-orphan")
      val v0 = StateTable.append(Seq((1L, "a")).toDF("k", "val"), dir,
        StateTable.ConditionalPutClaim)
      assert(v0 == 0)
      // plant the orphan at the next slot
      val orphan = new Path(s"$dir/v=1")
      java.nio.file.Files.createFile(java.nio.file.Paths.get(
        StateTable.ConditionalPutClaim.marker(orphan).toUri.getPath))
      // fresh marker = active lease: never reclaimed by the direct
      // call, and an append with the default store skips past it
      // (the old, still-safe hole behavior)
      assert(!StateTable.ConditionalPutClaim.reclaimOrphan(
        spark, orphan, ttlMs = 60000L))
      // ttl-0 store (the "15 minutes later" view): the next append
      // finds the orphan AT the frontier, reclaims it, and lands on
      // the planted version — no permanent hole
      val janitor = new StateTable.ClaimStore {
        def tryClaim(s: org.apache.spark.sql.SparkSession, t: Path,
            d: Path): Boolean =
          StateTable.ConditionalPutClaim.tryClaim(s, t, d)
        override def reclaimOrphan(s: org.apache.spark.sql.SparkSession,
            d: Path): Boolean =
          StateTable.ConditionalPutClaim.reclaimOrphan(s, d, ttlMs = 0L)
      }
      assert(StateTable.append(Seq((2L, "b")).toDF("k", "val"), dir,
        janitor) == 1, "janitor did not reclaim the orphaned slot")
      // a SECOND orphan, this time aged under the default TTL: the
      // default store treats it as an active lease and advances past
      java.nio.file.Files.createFile(java.nio.file.Paths.get(
        StateTable.ConditionalPutClaim.marker(new Path(s"$dir/v=2"))
          .toUri.getPath))
      assert(StateTable.append(Seq((3L, "c")).toDF("k", "val"), dir,
        StateTable.ConditionalPutClaim) == 3)
      assert(StateTable.versions(spark, dir) == Seq(0, 1, 3))
      assert(StateTable.readLatest(spark, dir, Seq("k")).count() == 3)
      // RenameClaim on the same dir: its default reclaim is a no-op
      // (rename claims cannot orphan) and appends still serialize
      assert(StateTable.append(Seq((4L, "d")).toDF("k", "val"), dir,
        StateTable.RenameClaim) == 4)
    }

    // the marker protocol refuses to merge into a slot that holds
    // data WITHOUT a marker (written outside the protocol — e.g. a
    // mixed-store race where a RenameClaim writer took the slot):
    // winning the marker must surface the violation, never interleave
    val dirty = tmpDir("state-cas-dirty")
    Seq((1L, "a")).toDF("k", "val").write.parquet(s"$dirty/v=0")
    Seq((2L, "b")).toDF("k", "val").write.parquet(s"$dirty/.tmp-x")
    val e = intercept[IllegalStateException] {
      StateTable.ConditionalPutClaim.tryClaim(spark,
        new org.apache.hadoop.fs.Path(s"$dirty/.tmp-x"),
        new org.apache.hadoop.fs.Path(s"$dirty/v=0"))
    }
    assert(e.getMessage.contains("claim protocol"))
  }

  test("state write-back overwrites the previous snapshot") {
    val dir = tmpDir("state")
    Writers.state(Seq(1L).toDF("k"), dir, "braze")
    val p = Writers.state(Seq(2L, 3L).toDF("k"), dir, "braze")
    assert(spark.read.json(p).count() == 2) // overwrite, not append
  }

  test("writeRangeSorted: per-file spans are disjoint and internally sorted") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rangesort-").toString
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1L to 1000L).toVector).map(i => (i, s"p$i"))
    Bucketing.writeRangeSorted(rows.toDF("k", "payload"), dir, "k",
      nFiles = 3)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(back.length == 1000) // lossless
    val byFile = back.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byFile.size == 3)
    // sorted within each file (read-back preserves in-file row order)
    byFile.values.foreach(ks => assert(ks.sameElements(ks.sorted)))
    // disjoint [min, max] spans across files
    val spans = byFile.values.map(ks => (ks.min, ks.max)).toSeq
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ =>
    }
  }

  test("zValue matches a bit-loop reference and orders 2-D locality") {
    import graft.io.ZOrder
    // reference: interleave bit i of x at 2i, bit i of y at 2i+1
    def ref(x: Long, y: Long): Long =
      (0 until 31).foldLeft(0L) { (z, i) =>
        z | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
      }
    val pts = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x,$y)") }
    // large values cluster by their low 31 bits instead of overflowing
    val big = Seq((Long.MaxValue, Long.MaxValue)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"))).as[Long].collect()
    assert(big.head == ref(0x7FFFFFFFL, 0x7FFFFFFFL) && big.head > 0)
  }

  test("writeZOrdered: files are z-disjoint and bound BOTH columns") {
    import graft.io.ZOrder
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zorder-").toString
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle(
      (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toVector)
    ZOrder.writeZOrdered(rows.toDF("x", "y"), dir, "x", "y", nFiles = 4)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("x"), col("y"),
        ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(back.length == 64 * 64) // lossless, z column not written
    assert(spark.read.parquet(dir).columns.toSeq == Seq("x", "y"))
    val byFile = back.groupBy(_._1).values.toSeq
    assert(byFile.size == 4)
    // z-spans disjoint across files
    val spans = byFile.map(rs => (rs.map(_._4).min, rs.map(_._4).max))
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB)
      case _ =>
    }
    // the 2-D payoff: every file's bounding box on x AND y is a strict
    // subset of the global domain, so a predicate on either column can
    // prune files — a single-column sort leaves the other dimension's
    // per-file span at the full domain width
    byFile.foreach { rs =>
      val (xs, ys) = (rs.map(_._2), rs.map(_._3))
      assert(xs.max - xs.min < 63L || ys.max - ys.min < 63L)
    }
    // and a concrete corner probe skips at least one file on stats
    val hit = byFile.count { rs =>
      val (xs, ys) = (rs.map(_._2), rs.map(_._3))
      xs.min <= 3 && 0 <= xs.max && ys.min <= 3 && 0 <= ys.max
    }
    assert(hit < 4, "corner box should not intersect every file's stats")
  }

  test("connectorOutput honors compression and maxRecordsPerFile") {
    val root = tmpDir("sink")
    val df = (1 to 10).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .coalesce(1)
    val dir = Writers.connectorOutput(df, root, "braze",
      LocalDateTime.of(2024, 1, 2, 3, 4, 5),
      compression = Some("gzip"), maxRecordsPerFile = Some(4L))
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    // 10 rows / max 4 per file from one task -> 3 gzipped parts
    assert(files.length == 3)
    assert(spark.read.json(dir).count() == 10) // codec-transparent read
  }

  test("StateTable.maybeCompact fires only past the version threshold") {
    import graft.io.StateTable
    val dir = tmpDir("autocompact") + "/tbl"
    StateTable.append(Seq((1L, "a")).toDF("k", "p"), dir)
    StateTable.append(Seq((2L, "b")).toDF("k", "p"), dir)
    assert(StateTable.maybeCompact(spark, dir, Seq("k"), 2).isEmpty)
    assert(StateTable.versions(spark, dir).size == 2) // untouched
    StateTable.append(Seq((1L, "a2")).toDF("k", "p"), dir)
    assert(StateTable.maybeCompact(spark, dir, Seq("k"), 2).nonEmpty)
    assert(StateTable.versions(spark, dir).size == 1) // folded
    assert(StateTable.readLatest(spark, dir, Seq("k"))
      .as[(Long, String)].collect().toSet == Set((1L, "a2"), (2L, "b")))
  }

  test("StateTable: upserts, tombstones, and compaction preserve state") {
    import graft.io.StateTable
    val dir = tmpDir("statetbl") + "/tbl"
    val v0 = StateTable.append(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "payload"), dir)
    val v1 = StateTable.append(
      Seq((2L, "b2", false), (3L, "c", true)).toDF("k", "payload",
        StateTable.DeletedCol), dir)
    assert(v0 == 0 && v1 == 1)
    def state() = StateTable.readLatest(spark, dir, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(state() == Set((1L, "a"), (2L, "b2"))) // 3 tombstoned
    val vc = StateTable.compact(spark, dir, Seq("k"))
    assert(StateTable.versions(spark, dir) == Seq(vc)) // chain folded
    assert(state() == Set((1L, "a"), (2L, "b2"))) // same state after
    StateTable.append(Seq((4L, "d")).toDF("k", "payload"), dir)
    assert(state() == Set((1L, "a"), (2L, "b2"), (4L, "d")))
  }
}
