package graft

import org.apache.spark.sql.functions._

import graft.operators.Reconcile

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def diff(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, n: Int = 8) =
    Reconcile.merkleDiff(a, b, Seq("k"), nBuckets = n)
      .as[(String, Long)].collect().toSet

  test("merkleDiff: modify reports both sides, insert/delete one") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((1L, "x"), (2L, "CHANGED"), (4L, "new")).toDF("k", "v")
    assert(diff(a, b) == Set(
      ("a", 2L), ("b", 2L), // modified: absent from both directions
      ("a", 3L),            // deleted from b
      ("b", 4L)))           // inserted in b
  }

  test("merkleDiff: identical tables produce an empty diff") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(diff(a, a.select(col("k"), col("v"))) == Set.empty)
  }

  test("merkleDiff: separator and null sentinel prevent false equality") {
    // ("ab","c") vs ("a","bc") concatenate identically without a field
    // separator; null vs "" collide without a sentinel
    val a = Seq((1L, Some("ab"), Some("c")), (2L, None, Some("")))
      .toDF("k", "v1", "v2")
    val b = Seq((1L, Some("a"), Some("bc")), (2L, Some(""), Some("")))
      .toDF("k", "v1", "v2")
    val out = Reconcile.merkleDiff(a, b, Seq("k"), nBuckets = 4)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("a", 1L), ("b", 1L), ("a", 2L), ("b", 2L)))
  }

  test("merkleDiff: broadcast dirty-bucket gate, no cartesian") {
    val a = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val b = a.where(col("o_orderkey") % 101 =!= 0)
    val out = Reconcile.merkleDiff(a, b, Seq("o_orderkey"),
      nBuckets = 64)
    val sides = out.groupBy("side").count()
      .as[(String, Long)].collect().toMap
    val expect = a.where(col("o_orderkey") % 101 === 0).count()
    assert(sides.getOrElse("a", 0L) == expect && !sides.contains("b"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "bucket gate not broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("snapshotDelta: typed I/U/D with the right image, silence else") {
    val before = Seq((1L, "a", Some(10)), (2L, "b", Some(20)),
      (3L, "c", None), (4L, "d", Some(40))).toDF("k", "name", "v")
    val after = Seq((1L, "a", Some(10)),          // unchanged: silent
      (2L, "b", Some(99)),                        // U: after-image 99
      (3L, "c", Some(30)),                        // U: null -> 30
      (5L, "e", Some(50))).toDF("k", "name", "v") // I; 4 deleted
    val out = Reconcile.snapshotDelta(before, after, Seq("k"))
      .as[(Long, String, String, Option[Int])].collect().toSet
    assert(out == Set(
      (2L, "U", "b", Some(99)),
      (3L, "U", "c", Some(30)),
      (4L, "D", "d", Some(40)), // D carries the before-image
      (5L, "I", "e", Some(50))))
    // U detection is null-safe BOTH ways: 30 -> null is a change too
    val rev = Reconcile.snapshotDelta(after, before, Seq("k"))
      .where(col("k") === 3L).as[(Long, String, String, Option[Int])]
      .collect().toSeq
    assert(rev == Seq((3L, "U", "c", None)))
  }

  test("snapshotDelta: no window, single full-outer join plan") {
    val before = Seq((1L, "a")).toDF("k", "v")
    val after = Seq((1L, "b")).toDF("k", "v")
    val plan = Reconcile.snapshotDelta(before, after, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
