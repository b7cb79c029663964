package graft

import graft.operators.OffPolicy

/** Paper-checkable fixtures for the IPS estimator family: empirical
  * propensities, weight capping, self-normalization, policy misses,
  * and the greedy-policy tie order.
  */
class OffPolicySpec extends SparkSpec {
  import spark.implicits._

  // context A: a1 logged twice (r=1.0), a2 once (r=3.0) -> p(a2|A)=1/3
  // context B: b1 once (r=2.0)                          -> p(b1|B)=1
  private def log = Seq(
    ("A", "a1", 1.0), ("A", "a1", 1.0), ("A", "a2", 3.0),
    ("B", "b1", 2.0)
  ).toDF("context", "action", "reward")

  test("greedyPolicy: argmax total reward, ties action-desc") {
    val pol = OffPolicy.greedyPolicy(log).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pol == Map("A" -> "a2", "B" -> "b1")) // a2: 3.0 > a1: 2.0
    val tied = Seq(("C", "x", 1.0), ("C", "y", 1.0))
      .toDF("context", "action", "reward")
    val p2 = OffPolicy.greedyPolicy(tied).collect().head.getString(1)
    assert(p2 == "y") // equal totals -> max-struct order picks y
  }

  test("ipsEstimates: empirical propensities, IPS / capped / SNIPS") {
    val out = OffPolicy.ipsEstimates(log, OffPolicy.greedyPolicy(log),
      cap = 2.0).collect().head
    assert(out.getAs[Long]("n") == 4)
    assert(out.getAs[Long]("matched") == 2)
    // matched terms: A/a2 r=3 w=3 -> 9; B/b1 r=2 w=1 -> 2
    assert(out.getAs[Double]("ips") == 2.75)      // (9+2)/4
    assert(out.getAs[Double]("ips_capped") == 2.0) // (3*2+2)/4
    assert(out.getAs[Double]("snips") == 2.75)     // (9+2)/(3+1)
  }

  test("ipsEstimates: logged propensity column is honored") {
    val withP = Seq(("A", "a2", 3.0, 0.5), ("A", "a1", 1.0, 0.5))
      .toDF("context", "action", "reward", "p")
    val pol = Seq(("A", "a2")).toDF("context", "action")
    val out = OffPolicy.ipsEstimates(withP, pol,
      propensityCol = Some("p"), cap = 10.0).collect().head
    assert(out.getAs[Double]("ips") == 3.0)   // 3*2 / 2 rows
    assert(out.getAs[Double]("snips") == 3.0) // 6/2
  }

  test("ipsEstimates: contexts missing from the policy never match") {
    val pol = Seq(("B", "b1")).toDF("context", "action")
    val out = OffPolicy.ipsEstimates(log, pol, cap = 10.0)
      .collect().head
    assert(out.getAs[Long]("n") == 4) // A rows still counted in n
    assert(out.getAs[Long]("matched") == 1)
    assert(out.getAs[Double]("ips") == 0.5) // 2*1/4
  }

  test("ipsEstimates: zero matches yields null SNIPS, zero IPS") {
    val pol = Seq(("A", "nope")).toDF("context", "action")
    val out = OffPolicy.ipsEstimates(log, pol).collect().head
    assert(out.getAs[Double]("ips") == 0.0)
    assert(out.isNullAt(out.fieldIndex("snips")))
    intercept[IllegalArgumentException] {
      OffPolicy.ipsEstimates(log, pol, cap = 0.0)
    }
  }
}
