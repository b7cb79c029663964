package graft

import org.apache.spark.sql.functions._

/** StressScale's content mutations (the scaler is a bench-input dev
  * tool, but its mutation algebra must be total — ADVICE r12: the raw
  * `__rep`-position shift produced a negative-length slice past the
  * embedding dimension and a byte-identical copy AT it).
  */
class StressScaleSpec extends SparkSpec {
  import spark.implicits._

  test("mutateVec rotates by rep mod dim, negates the second lap, " +
      "and carries 2*dim distinct members") {
    val v = Seq(1f, 2f, 3f, 4f)
    val df = (0L until 8L).map((_, v)).toDF("__rep", "v")
    val out = df
      .withColumn("m", StressScale.mutateVec(col("v")))
      .select("__rep", "m").as[(Long, Seq[Float])]
      .collect().toMap
    assert(out(0L) == Seq(1f, 2f, 3f, 4f)) // replica 0: untouched
    assert(out(1L) == Seq(2f, 3f, 4f, 1f)) // left-rotate by 1
    // second lap (rep / dim odd): same rotation, globally negated —
    // distinct bytes AND cosine -1 against the first-lap twin, so the
    // family stays near-dup-free through factor == 2*dim
    assert(out(4L) == Seq(-1f, -2f, -3f, -4f))
    assert(out(5L) == Seq(-2f, -3f, -4f, -1f)) // 5 mod 4 = 1, negated
    assert(out(6L) == Seq(-3f, -4f, -1f, -2f)) // 6 mod 4 = 2, negated
    // all 2*dim members pairwise distinct, norm preserved throughout
    assert(out.values.toSeq.distinct.size == 8)
    assert(out.values.forall(_.map(math.abs).sorted == v))
  }

  test("plantSkew routes ~1/7 of events to the hot user, leaves the rest") {
    val df = (0L until 700L).map(i => (i, 1000L + i)).toDF("event_id", "user_id")
    val out = StressScale.plantSkew("events", df)
    val hot = out.where(col("user_id") === StressScale.HotUserId).count()
    assert(hot == 100) // every 7th event_id of 0..699
    // non-hot rows keep their original user ids
    assert(out.where(col("user_id") =!= StressScale.HotUserId &&
      col("user_id") === col("event_id") + 1000L).count() == 600)
  }

  test("plantSkew mega-cluster: shared-base near-dups, no exact twins") {
    val df = (0L until 100L).map(i => (i, s"doc $i body", 10L))
      .toDF("doc_id", "text", "n_chars")
    val out = StressScale.plantSkew("documents", df).cache()
    val hot = out.where(col("doc_id") % 20 === 0)
    assert(hot.count() == 5)
    // all mega docs share the 60-token base but none are byte-identical
    assert(hot.where(col("text").startsWith("mega1 ")).count() == 5)
    assert(hot.select("text").distinct().count() == 5)
    // n_chars tracks the rewritten text exactly
    assert(hot.where(length(col("text")) === col("n_chars")).count() == 5)
    // cold docs untouched
    assert(out.where(col("doc_id") % 20 =!= 0 &&
      !col("text").startsWith("mega")).count() == 95)
    out.unpersist()
  }

  test("plantSkew is identity for tables without a planted distribution") {
    val df = Seq((1L, 2L)).toDF("o_orderkey", "o_custkey")
    assert(StressScale.plantSkew("orders", df) eq df)
  }
}
