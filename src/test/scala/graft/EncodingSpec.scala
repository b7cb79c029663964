package graft

import graft.operators.{Encoding, Popularity}

/** Hand-computed fixtures for target/LOO encoding and the popularity
  * profile operators.
  */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 10.0), ("a", 20.0), ("b", 40.0), (null, 99.0)
  ).toDF("cat", "y")

  test("targetEncode: shrinkage toward the global prior") {
    // prior = 70/3; m=3: a -> (30 + 70) / (2+3) = 20; b -> (40+70)/4 = 27.5
    val out = Encoding.targetEncode(df, "cat", "y", smoothing = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map("a" -> ((2L, 20.0)), "b" -> ((1L, 27.5))))
    // m = 0 degenerates to raw category means
    val raw = Encoding.targetEncode(df, "cat", "y", smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(raw == Map("a" -> 15.0, "b" -> 40.0))
    intercept[IllegalArgumentException] {
      Encoding.targetEncode(df, "cat", "y", smoothing = -1.0)
    }
  }

  test("leaveOneOut: self excluded; singleton falls back to prior") {
    val out = Encoding.leaveOneOut(df, "cat", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("loo")).toMap
    assert(out(("a", 10.0)) == 20.0) // (30-10)/1
    assert(out(("a", 20.0)) == 10.0)
    // b is a singleton -> prior = 70/3
    assert(math.abs(out(("b", 40.0)) - 70.0 / 3.0) < 1e-6)
    assert(out.size == 3) // null category row dropped
  }

  test("decayedScores: half-life halves the weight; exact at age 0") {
    val day = 86400000000L
    val inter = Seq((1L, 10L * day), (1L, 8L * day), (2L, 10L * day))
      .toDF("item", "ts_us")
    val out = Popularity.decayedScores(inter, "item", "ts_us",
        refMicros = 10L * day, halfLifeDays = 2.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out(2L) == ((1L, 1.0)))          // age 0
    assert(out(1L) == ((2L, 1.5)))          // 1 + 2^(-2/2)
    intercept[IllegalArgumentException] {
      Popularity.decayedScores(inter, "item", "ts_us", 0L, 0.0)
    }
  }

  test("concentrationProfile: uniform counts -> gini 0; skew raises it") {
    val uniform = Seq.tabulate(20)(i => (i.toLong, "x")).toDF("item", "p")
    val u = Popularity.concentrationProfile(uniform, "item")
      .collect().head
    assert(u.getAs[Long]("n_items") == 20)
    assert(u.getAs[Double]("gini") == 0.0)
    // top 1% of 20 items = ceil(0.2) = 1 item -> 1/20 of interactions
    assert(u.getAs[Double]("top1_share") == 0.05)
    assert(u.getAs[Double]("top10_share") == 0.1) // 2 items

    // one item with 9 hits + 9 items with 1: sorted asc x = [1..1, 9]
    // wsum = sum(i*1, i=1..9) + 10*9 = 45+90 = 135; n=10, S=18
    // gini = 2*135/(10*18) - 11/10 = 1.5 - 1.1 = 0.4
    val skew = (Seq.fill(9)(100L) ++ (1L to 9L)).map((_, "x"))
      .toDF("item", "p")
    val sk = Popularity.concentrationProfile(skew, "item")
      .collect().head
    assert(sk.getAs[Double]("gini") == 0.4)
    assert(sk.getAs[Double]("top1_share") == 0.5) // top item: 9/18
  }
}
