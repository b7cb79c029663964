package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Off-policy (counterfactual) evaluation of a candidate decision
  * policy from logged interaction data — the standard way to estimate
  * "what reward would the new recommender have earned" without an
  * online test. Implements the inverse-propensity-score family:
  * plain IPS, weight-capped IPS, and the self-normalized estimator
  * (SNIPS), over a log of (context, action, reward [, propensity])
  * rows and a deterministic target policy (context -> action).
  *
  * Scale shape: one aggregation over the log keyed by (context,
  * action) when propensities must be estimated empirically, one join
  * of the log back to those counts on the same key (co-partitioned —
  * Catalyst reuses the exchange), one broadcast join against the
  * policy table (bounded by the context-space size, a policy is a
  * dimension), and one global single-row aggregate. Nothing is
  * collected; no window, no all-pairs.
  *
  * Determinism: propensities are ratios of exact counts and weights
  * their reciprocals — IEEE division/multiplication is correctly
  * rounded, hence bit-identical across engines — and every sum is a
  * decimal sum of 12-decimal-rounded terms, so the estimates are
  * independent of partitioning and merge order.
  */
object OffPolicy {

  private val dec = DecimalType(28, 12)
  private def d12(c: Column): Column = round(c, 12).cast(dec)

  /** IPS / capped-IPS / SNIPS estimates of `policy`'s expected reward.
    *
    * @param log    logged interactions: context, action, reward.
    * @param policy deterministic target policy, one action per
    *               context (violations make matches ambiguous — the
    *               caller owns de-duplication; contexts absent from
    *               the policy never match). Broadcast: a policy table
    *               is context-space-sized, not log-sized.
    * @param propensityCol logged propensity of the TAKEN action if the
    *               producer recorded one; when None, empirical
    *               propensities count(context, action)/count(context)
    *               are estimated from the log itself (the standard
    *               fallback for non-randomized logs).
    * @param cap    weight cap M for the capped estimator:
    *               w = min(1/p, M). Caps the variance a rare logged
    *               action can contribute; bias-variance knob.
    * @return single row: n (log rows with non-null essentials),
    *         matched (rows where the policy picked the logged action),
    *         ips, ips_capped, snips (6-decimal doubles; snips null
    *         when nothing matched).
    */
  def ipsEstimates(log: DataFrame, policy: DataFrame,
      contextCol: String = "context", actionCol: String = "action",
      rewardCol: String = "reward",
      propensityCol: Option[String] = None,
      cap: Double = 10.0): DataFrame = {
    require(cap > 0.0, s"cap must be positive, got $cap")

    val base0 = log
      .select(col(contextCol).as("x"), col(actionCol).as("a"),
        col(rewardCol).cast("double").as("r"))
      .where(col("x").isNotNull && col("a").isNotNull &&
        col("r").isNotNull)

    val withP = propensityCol match {
      case Some(p) =>
        log.select(col(contextCol).as("x"), col(actionCol).as("a"),
            col(rewardCol).cast("double").as("r"),
            col(p).cast("double").as("prop"))
          .where(col("x").isNotNull && col("a").isNotNull &&
            col("r").isNotNull && col("prop") > 0.0)
      case None =>
        // Empirical propensities: both aggregations key on (x, a) / x;
        // the join back is on the aggregation key, so the exchange is
        // reused rather than re-shuffled.
        val xa = base0.groupBy("x", "a").agg(count(lit(1)).as("n_xa"))
        val xc = xa.groupBy("x").agg(sum("n_xa").as("n_x"))
        base0
          .join(xa, Seq("x", "a"))
          .join(xc, Seq("x"))
          .withColumn("prop",
            col("n_xa").cast("double") / col("n_x").cast("double"))
          .select("x", "a", "r", "prop")
    }

    val pol = policy
      .select(col(contextCol).as("x"), col(actionCol).as("pi_a"))
      .where(col("x").isNotNull && col("pi_a").isNotNull)

    val joined = withP
      .join(broadcast(pol), Seq("x"), "left")
      .withColumn("m", (col("a") === col("pi_a")).cast("int"))
      .withColumn("w", lit(1.0) / col("prop"))
      .withColumn("wc", least(col("w"), lit(cap)))

    joined.agg(
        count(lit(1)).as("n"),
        sum(coalesce(col("m"), lit(0))).cast("long").as("matched"),
        sum(d12(col("r") * col("w") * col("m"))).as("ips_num"),
        sum(d12(col("r") * col("wc") * col("m"))).as("ipsc_num"),
        sum(d12(col("w") * col("m"))).as("sn_den"))
      .select(col("n"), col("matched"),
        round(col("ips_num").cast("double") / col("n").cast("double"), 6)
          .as("ips"),
        round(col("ipsc_num").cast("double") / col("n").cast("double"), 6)
          .as("ips_capped"),
        when(col("sn_den") > 0,
          round(col("ips_num").cast("double") /
            col("sn_den").cast("double"), 6)).as("snips"))
  }

  /** Greedy argmax policy read off the log itself: for each context,
    * the action with the highest exact-decimal total reward (ties by
    * action DESCENDING — the max-struct order). A deterministic,
    * data-derived policy fixture — evaluating it with [[ipsEstimates]]
    * answers "what if we always took the historically best action per
    * context". Two aggregations, no window sort, no collect.
    */
  def greedyPolicy(log: DataFrame, contextCol: String = "context",
      actionCol: String = "action", rewardCol: String = "reward")
      : DataFrame =
    log
      .select(col(contextCol).as("x"), col(actionCol).as("a"),
        col(rewardCol).cast("decimal(18,6)").as("r"))
      .where(col("x").isNotNull && col("a").isNotNull &&
        col("r").isNotNull)
      .groupBy("x", "a")
      .agg(sum("r").as("tot"))
      .groupBy("x")
      // argmax as a plain max over the total (tot, a) struct order:
      // decimal totals are exact, so the winner is partition-invariant.
      .agg(max(struct(col("tot"), col("a"))).as("best"))
      .select(col("x").as(contextCol), col("best.a").as(actionCol))
}
