package graft

import org.apache.spark.sql.functions._

/** StressScale's content mutations (the scaler is a bench-input dev
  * tool, but its mutation algebra must be total — ADVICE r12: the raw
  * `__rep`-position shift produced a negative-length slice past the
  * embedding dimension and a byte-identical copy AT it).
  */
class StressScaleSpec extends SparkSpec {
  import spark.implicits._

  test("mutateVec rotates by rep mod dim and is total past the dimension") {
    val v = Seq(1f, 2f, 3f, 4f)
    val df = Seq(0L, 1L, 4L, 5L, 6L).map((_, v)).toDF("__rep", "v")
    val out = df
      .withColumn("m", StressScale.mutateVec(col("v")))
      .select("__rep", "m").as[(Long, Seq[Float])]
      .collect().toMap
    assert(out(0L) == Seq(1f, 2f, 3f, 4f)) // replica 0: untouched
    assert(out(1L) == Seq(2f, 3f, 4f, 1f)) // left-rotate by 1
    // rep == dim: shift 0 — identical by pmod, NOT a crash; main's
    // factor <= dim guard keeps this degenerate out of real runs
    assert(out(4L) == Seq(1f, 2f, 3f, 4f))
    assert(out(5L) == Seq(2f, 3f, 4f, 1f)) // 5 mod 4 = 1
    assert(out(6L) == Seq(3f, 4f, 1f, 2f)) // 6 mod 4 = 2
    // norm preserved for every replica
    assert(out.values.forall(_.sorted == v))
  }
}
