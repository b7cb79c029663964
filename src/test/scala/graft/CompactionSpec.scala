package graft

import graft.io.Compaction

/** Paper-checkable packing fixtures: bin boundaries, straddling files,
  * oversized files, per-partition independence, and the summary rollup.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("plan: smallest-first offsets, straddler joins the bin it starts in") {
    // sizes asc: 3,4,5 -> offsets 0,3,7; target 6 -> bins 0,0,1
    val m = Seq(("a", 5L), ("b", 3L), ("c", 4L)).toDF("f", "sz")
    val out = Compaction.plan(m, "f", "sz", 6L)
      .select("f", "bin_offset", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("b", 0L, 0L), ("c", 3L, 0L), ("a", 7L, 1L)))
  }

  test("plan: oversized file is alone in its bin; ids are offset-derived") {
    // sizes asc: 2,2,25 -> offsets 0,2,4; target 10 -> bins 0,0,0 for
    // the small pair... the 25-byte file starts at offset 4 -> bin 0!
    // smallest-first puts it LAST, so the small files' bin absorbs its
    // start; the next file after it would start at offset 29 -> bin 2.
    val m = Seq(("big", 25L), ("s1", 2L), ("s2", 2L), ("t", 30L))
      .toDF("f", "sz")
    val out = Compaction.plan(m, "f", "sz", 10L)
      .select("f", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("s1") == 0L && out("s2") == 0L)
    assert(out("big") == 0L)   // starts at offset 4
    assert(out("t") == 2L)     // starts at offset 29 -> bin 2 (not dense)
  }

  test("plan: partitions pack independently") {
    val m = Seq(("p1", "a", 4L), ("p1", "b", 4L),
      ("p2", "c", 4L), ("p2", "d", 4L)).toDF("pk", "f", "sz")
    val out = Compaction.plan(m, "f", "sz", 4L, Seq("pk"))
      .select("pk", "f", "bin").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // each partition restarts at offset 0: a,c in bin 0; b,d in bin 1
    assert(out(("p1", "a")) == 0L && out(("p1", "b")) == 1L)
    assert(out(("p2", "c")) == 0L && out(("p2", "d")) == 1L)
  }

  test("summary: per-bin rollup flags multi-file bins for rewrite") {
    val m = Seq(("a", 3L), ("b", 3L), ("c", 50L)).toDF("f", "sz")
    val p = Compaction.plan(m, "f", "sz", 10L)
    val s = Compaction.summary(p, "sz").collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
          r.getAs[Boolean]("rewrite"))).toMap
    assert(s(0L) == ((3L, 56L, true))) // a,b + c's straddling start
    intercept[IllegalArgumentException] {
      Compaction.plan(m, "f", "sz", 0L)
    }
  }

  test("plan: null files dropped, zero-size files tie-break by name") {
    val m = Seq((Some("a"), 0L), (Some("b"), 0L), (None, 5L))
      .toDF("f", "sz")
    val out = Compaction.plan(m, "f", "sz", 10L).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("bin_offset")).forall(_ == 0L))
  }
}
