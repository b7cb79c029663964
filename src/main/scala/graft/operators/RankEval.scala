package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Offline top-k ranking evaluation for recommendation outputs — the
  * measurement half the reference leaves to the managed service
  * (`related_items_etl.py` ships recommendations out but never scores
  * them). Given a ranked recommendation table and a held-out
  * ground-truth interaction table, computes the standard retrieval
  * metrics at each requested cutoff k: precision@k, recall@k, NDCG@k,
  * MRR@k, and hit-rate@k, macro-averaged over the ground-truth user
  * universe.
  *
  * Scale shape: the only data-sized work is one equi-join of the
  * recommendation table (|users| x maxK rows) against the de-duplicated
  * truth table on the composite (user, item) key — a single shuffle per
  * side, map-side-combinable aggregation after. The per-cutoff fan-out
  * multiplies only the HIT rows (bounded by |users| x maxK x |ks|), and
  * every later stage operates on at most one row per (user, cutoff).
  * The cutoff table and the NDCG discount lookup are driver literals —
  * nothing all-pairs, nothing collected.
  *
  * Determinism: per-user metrics are pure IEEE divisions of exact
  * integers (correctly rounded, hence bit-identical on any engine); the
  * NDCG discounts 1/log2(rank+1) are fixed 12-decimal constants
  * (driver-computed, HALF_UP) so the per-user DCG is an exact decimal
  * sum — merge-order-free — and macro-averages are decimal sums of
  * 12-decimal per-user values divided once in double at the end.
  */
object RankEval {

  /** 1/log2(i+1) for i = 1..maxK, each rounded HALF_UP to 12 decimals.
    * Rounding before summation is what makes DCG order-independent:
    * the terms become exact decimals, so any aggregation tree yields
    * the same sum bit-for-bit.
    */
  private[operators] def discounts(maxK: Int): Seq[JBigDecimal] =
    (1 to maxK).map { i =>
      new JBigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(12, RoundingMode.HALF_UP)
    }

  /** Ranking metrics at each cutoff in `ks`.
    *
    * @param recs  ranked recommendations: one row per (user, item) with
    *              a 1-based rank column; ranks beyond max(ks) are
    *              ignored. Null users/items are dropped.
    * @param truth held-out relevant interactions (user, item); internal
    *              de-duplication makes repeated interactions count once.
    * @param ks    cutoffs, each >= 1.
    * @return one row per k, ordered by k:
    *         (k, n_users, precision, recall, ndcg, mrr, hit_rate) where
    *         n_users is the ground-truth user universe — users with
    *         relevant items but no recommendations count as zeros, so
    *         a recommender that skips users is penalized, not excused.
    */
  def metricsAtK(recs: DataFrame, truth: DataFrame, ks: Seq[Int],
      userCol: String = "user_id", itemCol: String = "item_id",
      rankCol: String = "rank"): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.distinct.size == ks.size,
      s"cutoffs must be distinct and >= 1, got $ks")
    val spark = recs.sparkSession
    val maxK = ks.max
    val dec = DecimalType(28, 12)

    val disc = discounts(maxK)
    // element_at is 1-based: discArr(rank) = discount at that rank,
    // cumArr(j) = ideal DCG for j relevant items (j <= maxK after least()).
    val discArr = array(disc.map(d => lit(d).cast(dec)): _*)
    val cum = disc.scanLeft(JBigDecimal.ZERO)(_.add(_)).tail
    val cumArr = array(cum.map(d => lit(d).cast(dec)): _*)

    val truthD = truth
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull)
      .distinct()
    val nRel = truthD.groupBy("u").agg(count(lit(1)).as("n_rel"))

    val recsB = recs
      .select(col(userCol).as("u"), col(itemCol).as("i"),
        col(rankCol).cast("int").as("r"))
      .where(col("u").isNotNull && col("i").isNotNull &&
        col("r").between(1, maxK))

    import spark.implicits._
    val kTable = ks.sorted.toDF("k")

    // Relevant recommended rows only — at most maxK per user.
    val hits = recsB.join(truthD, Seq("u", "i"))

    val perUserK = hits
      .join(broadcast(kTable), col("r") <= col("k"))
      .groupBy("k", "u")
      .agg(count(lit(1)).as("n_hit"), min("r").as("first_hit"),
        sum(element_at(discArr, col("r"))).as("dcg"))

    // Ground-truth universe x cutoffs; zero-filled where no hits.
    val universe = nRel.crossJoin(broadcast(kTable))
    val zero = lit(JBigDecimal.ZERO).cast(dec)
    def d12(c: org.apache.spark.sql.Column) = round(c, 12).cast(dec)

    val perUser = universe
      .join(perUserK, Seq("k", "u"), "left")
      .select(col("k"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("first_hit"), coalesce(col("dcg"), zero).as("dcg"))
      .select(col("k"),
        d12(col("n_hit").cast("double") / col("k").cast("double"))
          .as("p_u"),
        d12(col("n_hit").cast("double") / col("n_rel").cast("double"))
          .as("r_u"),
        d12(col("dcg").cast("double") /
            element_at(cumArr, least(col("k"), col("n_rel")).cast("int"))
              .cast("double")).as("ndcg_u"),
        d12(when(col("first_hit").isNotNull,
            lit(1.0) / col("first_hit").cast("double")).otherwise(0.0))
          .as("rr_u"),
        when(col("n_hit") > 0, lit(1L)).otherwise(lit(0L)).as("hit_u"))

    def avg6(c: String) =
      round(sum(col(c)).cast("double") / count(lit(1)).cast("double"), 6)

    perUser.groupBy("k")
      .agg(count(lit(1)).as("n_users"),
        avg6("p_u").as("precision"), avg6("r_u").as("recall"),
        avg6("ndcg_u").as("ndcg"), avg6("rr_u").as("mrr"),
        round(sum(col("hit_u")).cast("double") /
          count(lit(1)).cast("double"), 6).as("hit_rate"))
      .orderBy("k")
  }

  /** Beyond-accuracy recommendation metrics at cutoff `k`: catalog
    * coverage (share of the interaction catalog any user's top-k
    * reaches), novelty (mean self-information -log2(popularity) of the
    * recommended rows, add-one-smoothed so never-interacted items stay
    * defined), and exposure bias (mean raw popularity of recommended
    * rows — high means the recommender mostly re-serves head items).
    *
    * Scale shape: two distinct-aggregations over the interaction log
    * (catalog and user universes — scalar results), one per-item user
    * count, one join of the top-k slice against it on the item key,
    * one single-row aggregate. Popularities are exact count ratios,
    * novelty terms 12-decimal-rounded before the decimal sum.
    */
  def catalogMetrics(recs: DataFrame, interactions: DataFrame, k: Int,
      userCol: String = "user_id", itemCol: String = "item_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = DecimalType(28, 12)

    val inter = interactions
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull)
      .distinct()
    val itemUsers = inter.groupBy("i").agg(count(lit(1)).as("n_iu"))

    val topK = recs
      .select(col(itemCol).as("i"), col(rankCol).cast("int").as("r"))
      .where(col("i").isNotNull && col("r").between(1, k))

    // Scalar universes: one row each, cross-joined back (broadcast).
    val sizes = inter.agg(
      countDistinct(col("i")).as("catalog_size"),
      countDistinct(col("u")).as("n_users"))

    topK
      .join(itemUsers, Seq("i"), "left")
      .crossJoin(broadcast(sizes))
      .select(col("i"),
        (coalesce(col("n_iu"), lit(0L)).cast("double") /
          col("n_users").cast("double")).as("pop"),
        ((coalesce(col("n_iu"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_users") + lit(1L)).cast("double")).as("pop_s"),
        col("catalog_size"), col("n_users"))
      .agg(first(col("n_users")).as("n_users"),
        first(col("catalog_size")).as("catalog_size"),
        countDistinct(col("i")).as("n_rec_items"),
        sum(round(-log2(col("pop_s")), 12).cast(dec)).as("nov_sum"),
        sum(round(col("pop"), 12).cast(dec)).as("pop_sum"),
        count(lit(1)).as("n_rows"))
      .select(lit(k).as("k"), col("n_users"), col("catalog_size"),
        col("n_rec_items"),
        round(col("n_rec_items").cast("double") /
          col("catalog_size").cast("double"), 6).as("coverage"),
        round(col("nov_sum").cast("double") /
          col("n_rows").cast("double"), 6).as("novelty"),
        round(col("pop_sum").cast("double") /
          col("n_rows").cast("double"), 6).as("avg_popularity"))
  }
}
