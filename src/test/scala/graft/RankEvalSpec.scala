package graft

import org.apache.spark.sql.functions._

import graft.operators.RankEval

/** Hand-computed fixtures for the offline ranking metrics: every value
  * below is derivable on paper, so a regression in any metric's
  * definition (universe, zero-fill, discount, tie handling) fails here
  * before it reaches the oracle.
  */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // user 1: recs [a,b,c], truth {a,c}       -> hits at ranks 1,3
  // user 2: recs [x,y,z], truth {q}         -> no hits
  // user 3: no recs,      truth {m}         -> zero row (universe!)
  // user 4: recs [p,r],   truth {}          -> NOT in universe
  private def recs = Seq(
    (1L, "a", 1), (1L, "b", 2), (1L, "c", 3),
    (2L, "x", 1), (2L, "y", 2), (2L, "z", 3),
    (4L, "p", 1), (4L, "r", 2)
  ).toDF("user_id", "item_id", "rank")

  private def truth = Seq(
    (1L, "a"), (1L, "c"), (1L, "c"), // duplicate interaction counts once
    (2L, "q"), (3L, "m")
  ).toDF("user_id", "item_id")

  private val d1 = 1.0
  private val d3 = BigDecimal(1.0 / (math.log(4.0) / math.log(2.0)))
    .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("metricsAtK: universe, zero-fill, NDCG, MRR at k=3") {
    val out = RankEval.metricsAtK(recs, truth, Seq(3)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_users") == 3) // users 1,2,3 — not 4
    // precision: u1 = 2/3, u2 = 0, u3 = 0 -> avg = 2/9
    assert(math.abs(r.getAs[Double]("precision") - 2.0 / 9.0) < 1e-6)
    // recall: u1 = 2/2 = 1, others 0 -> 1/3
    assert(math.abs(r.getAs[Double]("recall") - 1.0 / 3.0) < 1e-6)
    // ndcg u1: dcg = d1 + d3, idcg(min(3, 2)) = d1 + 0.630929753571
    val idcg = d1 + 0.630929753571
    val expNdcg = ((d1 + d3) / idcg) / 3.0
    assert(math.abs(r.getAs[Double]("ndcg") - expNdcg) < 1e-6)
    // mrr: u1 first hit rank 1 -> 1.0; avg 1/3
    assert(math.abs(r.getAs[Double]("mrr") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("hit_rate") - 1.0 / 3.0) < 1e-6)
  }

  test("metricsAtK: k=1 cuts the rank-3 hit; multiple cutoffs ordered") {
    val out = RankEval.metricsAtK(recs, truth, Seq(3, 1)).collect()
    assert(out.map(_.getAs[Int]("k")).toSeq == Seq(1, 3))
    val k1 = out.head
    // u1 hit at rank 1 only: precision = 1, recall = 1/2, ndcg = 1
    assert(math.abs(k1.getAs[Double]("precision") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(k1.getAs[Double]("recall") - 0.5 / 3.0) < 1e-6)
    assert(math.abs(k1.getAs[Double]("ndcg") - 1.0 / 3.0) < 1e-6)
  }

  test("metricsAtK: perfect ranking scores 1.0 everywhere") {
    val r = Seq((7L, "a", 1), (7L, "b", 2)).toDF("user_id", "item_id", "rank")
    val tr = Seq((7L, "a"), (7L, "b")).toDF("user_id", "item_id")
    val out = RankEval.metricsAtK(r, tr, Seq(2)).collect().head
    assert(out.getAs[Double]("recall") == 1.0)
    assert(out.getAs[Double]("ndcg") == 1.0)
    assert(out.getAs[Double]("mrr") == 1.0)
    assert(out.getAs[Double]("hit_rate") == 1.0)
  }

  test("metricsAtK: n_rel beyond maxK clamps the IDCG index") {
    // 5 relevant items, k=2, both recs hit: ndcg = (d1+d2)/(d1+d2) = 1
    val r = Seq((9L, "a", 1), (9L, "b", 2)).toDF("user_id", "item_id", "rank")
    val tr = Seq("a", "b", "c", "d", "e").map((9L, _))
      .toDF("user_id", "item_id")
    val out = RankEval.metricsAtK(r, tr, Seq(2)).collect().head
    assert(out.getAs[Double]("ndcg") == 1.0)
    assert(math.abs(out.getAs[Double]("recall") - 0.4) < 1e-9)
  }

  test("metricsAtK: null users/items dropped, bad ks rejected") {
    val r = Seq((Some(1L), Some("a"), 1), (None, Some("b"), 1),
      (Some(1L), None, 2)).toDF("user_id", "item_id", "rank")
    val tr = Seq((Some(1L), Some("a")), (None, Some("z")))
      .toDF("user_id", "item_id")
    val out = RankEval.metricsAtK(r, tr, Seq(1)).collect()
    assert(out.head.getAs[Long]("n_users") == 1)
    assert(out.head.getAs[Double]("precision") == 1.0)
    intercept[IllegalArgumentException] {
      RankEval.metricsAtK(r, tr, Seq(0))
    }
    intercept[IllegalArgumentException] {
      RankEval.metricsAtK(r, tr, Seq(2, 2))
    }
  }
}
