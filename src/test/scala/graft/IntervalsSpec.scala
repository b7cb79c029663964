package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Intervals

/** Interval-overlap join: closed-interval semantics, emit-once
  * replication, key isolation, and a randomized differential against
  * the naive per-key overlap join.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(out: DataFrame): Set[(Long, Long, Long)] =
    out.select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet

  test("overlapJoin: containment, partial, touch, disjoint, key-isolated") {
    val left = Seq(
      (1L, 100L, 10L, 20L), // vs r200 [12,15] contained; r201 [20,30] touch
      (1L, 101L, 40L, 45L), // vs r202 [44,60] partial; r201 ends at 30: no
      (2L, 102L, 10L, 20L)  // same span as lid=100 but key 2: only r203
    ).toDF("k", "lid", "ls", "le")
    val right = Seq(
      (1L, 200L, 12L, 15L),
      (1L, 201L, 20L, 30L), // touches lid=100 at 20: closed -> overlap
      (1L, 202L, 44L, 60L),
      (1L, 203L, 90L, 99L), // disjoint from every key-1 left interval
      (2L, 203L, 15L, 50L)
    ).toDF("k", "rid", "rs", "re")
    val out = Intervals.overlapJoin(left, right, Seq("k"),
      "ls", "le", "rs", "re", bucketSpan = 7L)
    assert(pairs(out) == Set((1L, 100L, 200L), (1L, 100L, 201L),
      (1L, 101L, 202L), (2L, 102L, 203L)))
    // schema: keys once, left cols + right non-key cols
    assert(out.columns.toSeq == Seq("k", "lid", "ls", "le",
      "rid", "rs", "re"))
  }

  test("overlapJoin: one emission per pair across many shared buckets") {
    // both intervals cover buckets 0..9 at span=10: the emit-once rule
    // must collapse the 10 bucket collisions to a single output row
    val left = Seq((1L, 1L, 0L, 99L)).toDF("k", "lid", "ls", "le")
    val right = Seq((1L, 2L, 0L, 99L)).toDF("k", "rid", "rs", "re")
    val out = Intervals.overlapJoin(left, right, Seq("k"),
      "ls", "le", "rs", "re", bucketSpan = 10L)
    assert(out.count() == 1L)
  }

  test("overlapJoin: clashing right columns take the suffix") {
    val left = Seq((1L, 10L, 20L, "L")).toDF("k", "s", "e", "tag")
    val right = Seq((1L, 15L, 25L, "R")).toDF("k", "s", "e", "tag")
    val out = Intervals.overlapJoin(left, right, Seq("k"),
      "s", "e", "s", "e", bucketSpan = 8L)
    assert(out.columns.toSeq ==
      Seq("k", "s", "e", "tag", "s_r", "e_r", "tag_r"))
    val row = out.collect().head
    assert(row.getAs[String]("tag") == "L" &&
      row.getAs[String]("tag_r") == "R")
  }

  test("overlapJoin: inverted and null-bounded intervals match nothing") {
    val left = Seq((1L, 1L, Some(30L), Some(20L)), // inverted: empty set
      (1L, 2L, None, Some(20L)), // null bound
      (1L, 3L, Some(10L), Some(12L))).toDF("k", "lid", "ls", "le")
    val right = Seq((1L, 9L, 0L, 100L)).toDF("k", "rid", "rs", "re")
    val out = Intervals.overlapJoin(left, right, Seq("k"),
      "ls", "le", "rs", "re", bucketSpan = 16L)
    assert(pairs(out) == Set((1L, 3L, 9L)))
  }

  test("overlapJoin: randomized differential vs the naive overlap join") {
    // deterministic pseudo-random intervals from hashed ids (no
    // Random): spans 0-40 over a 0-400 range, 3 keys, both sides
    def gen(n: Int, idBase: Long, name: String): DataFrame =
      spark.range(n).select(
        (pmod(xxhash64(col("id") + idBase), lit(3))).as("k"),
        (col("id") + idBase).as(name),
        pmod(xxhash64(col("id") * 7 + idBase), lit(400)).as("s0"),
        pmod(xxhash64(col("id") * 13 + idBase), lit(41)).as("len"))
        .select(col("k"), col(name), col("s0").as(s"${name}_s"),
          (col("s0") + col("len")).as(s"${name}_e"))
    val l = gen(120, 1000L, "lid")
    val r = gen(150, 5000L, "rid")
    val got = Intervals.overlapJoin(l, r, Seq("k"),
        "lid_s", "lid_e", "rid_s", "rid_e", bucketSpan = 25L)
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    val want = l.join(r, Seq("k"))
      .where(col("lid_s") <= col("rid_e") && col("rid_s") <= col("lid_e"))
      .select("k", "lid", "rid").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // and no duplicate emissions anywhere
    val total = Intervals.overlapJoin(l, r, Seq("k"),
      "lid_s", "lid_e", "rid_s", "rid_e", bucketSpan = 25L).count()
    assert(total == want.size.toLong)
  }

  test("overlapJoin plan: an equi-join on (key, bucket), never a BNLJ") {
    val l = Seq((1L, 2L, 10L, 20L)).toDF("k", "lid", "ls", "le")
    val r = Seq((1L, 3L, 12L, 15L)).toDF("k", "rid", "rs", "re")
    val plan = Intervals.overlapJoin(l, r, Seq("k"),
      "ls", "le", "rs", "re", bucketSpan = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
