package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative-filtering similarity from co-occurrence —
  * the classic "customers who interacted with X also interacted with Y"
  * neighbor table the reference's recommendation payloads come from
  * upstream. Cosine over the binary user-item matrix:
  * sim(i,j) = |U_i ∩ U_j| / sqrt(|U_i| * |U_j|).
  *
  * Scale shape: the only quadratic danger in item-CF is the per-user
  * pair fan-out — a user with n items contributes n(n-1)/2 pairs, so
  * one 100k-item crawler bot would emit 5e9 pairs. `maxUserItems` caps
  * it: users above the cap are EXCLUDED before pairing (standard
  * practice — hyperactive accounts carry almost no preference signal),
  * bounding the blow-up at cap² per user. After the cap the plan is
  * one self-join co-partitioned on the user key (each unordered pair
  * counted once via i < j), one (i,j) count aggregation with map-side
  * combine, two equi-joins against the per-item support counts on the
  * item key, and a per-item top-N window that WindowGroupLimit prunes
  * to N rows per partition before the final exchange. Nothing
  * collected.
  *
  * Determinism: co-counts and item counts are exact integers; the
  * cosine is one long multiply, one IEEE sqrt, one IEEE divide — all
  * correctly rounded, hence bit-identical on any engine and any
  * partitioning; ties rank by neighbor id.
  */
object ItemSim {

  /** Top-N cosine neighbors per item.
    *
    * @param interactions (user, item) rows; internally de-duplicated,
    *                     nulls dropped.
    * @param maxUserItems users with more distinct items are excluded
    *                     before pairing (fan-out cap).
    * @param minCo        minimum shared-user count for a pair to score
    *                     (prunes the long noise tail before the window).
    * @param topN         neighbors kept per item.
    * @return (item, neighbor, co, sim, rank), rank 1-based by
    *         (sim desc, neighbor asc), ordered by (item, rank).
    */
  def cosineNeighbors(interactions: DataFrame,
      userCol: String = "user_id", itemCol: String = "item_id",
      maxUserItems: Int = 100, minCo: Long = 2L, topN: Int = 10)
      : DataFrame = {
    require(maxUserItems >= 2, s"maxUserItems must be >= 2 (a user " +
      s"with fewer than 2 items contributes no pairs), got $maxUserItems")
    require(topN >= 1 && minCo >= 1, s"topN/minCo must be >= 1")

    val ui = cleaned(interactions, userCol, itemCol)
    val capped = capUsers(ui, maxUserItems)
    score(pairCounts(capped, minCo),
      capped.groupBy("i").agg(count(lit(1)).as("n_i")), topN)
  }

  private def cleaned(interactions: DataFrame, userCol: String,
      itemCol: String): DataFrame =
    interactions
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .where(col("u").isNotNull && col("i").isNotNull)
      .distinct()

  private def capUsers(ui: DataFrame, maxUserItems: Int): DataFrame = {
    val keptUsers = ui.groupBy("u").agg(count(lit(1)).as("n_u"))
      .where(col("n_u") <= maxUserItems)
      .select("u")
    ui.join(keptUsers, Seq("u"))
  }

  /** Unordered-pair co-counts (ia < ib) over a capped population. */
  private def pairCounts(capped: DataFrame, minCo: Long): DataFrame = {
    val a = capped.select(col("u"), col("i").as("ia"))
    val b = capped.select(col("u"), col("i").as("ib"))
    a.join(b, a("u") === b("u") && col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("co"))
      .where(col("co") >= minCo)
  }

  /** Symmetrize, cosine-score against the supports, rank top-N. */
  private def score(co: DataFrame, itemN: DataFrame, topN: Int)
      : DataFrame = {
    val sym = co.select(col("ia").as("item"), col("ib").as("neighbor"),
        col("co"))
      .unionAll(co.select(col("ib").as("item"), col("ia").as("neighbor"),
        col("co")))
    sym
      .join(itemN.withColumnRenamed("i", "item")
        .withColumnRenamed("n_i", "n_item"), Seq("item"))
      .join(itemN.withColumnRenamed("i", "neighbor")
        .withColumnRenamed("n_i", "n_nb"), Seq("neighbor"))
      .withColumn("sim", col("co").cast("double") /
        sqrt((col("n_item") * col("n_nb")).cast("double")))
      .withColumn("rank", row_number().over(Window.partitionBy("item")
        .orderBy(col("sim").desc, col("neighbor"))))
      .where(col("rank") <= topN)
      .select(col("item"), col("neighbor"), col("co"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("item", "rank")
  }

  /** Incremental maintenance: the neighbor table after folding a
    * DELTA of new interactions into an existing log, computing the
    * quadratic pair fan-out ONLY for the users the delta touches.
    * OUTPUT-IDENTICAL to `cosineNeighbors(existing union delta)` —
    * pair counts partition additively by user (a pair is counted
    * within exactly one user), so
    * counts(full) = counts(existing, unaffected users)
    *              + counts(full, affected users),
    * and the cap decision for an unaffected user is unchanged by the
    * delta. Supports are one cheap re-aggregation of the capped full
    * population.
    *
    * Scale shape: the daily-delta regime this serves has |affected
    * users| << |users|, so the expensive stage (per-user pair
    * fan-out) shrinks from the whole log to the touched histories;
    * everything else is the same bounded joins as the batch build.
    */
  def cosineNeighborsIncremental(existing: DataFrame, delta: DataFrame,
      userCol: String = "user_id", itemCol: String = "item_id",
      maxUserItems: Int = 100, minCo: Long = 2L, topN: Int = 10)
      : DataFrame = {
    require(maxUserItems >= 2 && topN >= 1 && minCo >= 1,
      s"bad params: cap=$maxUserItems topN=$topN minCo=$minCo")
    val oldUi = cleaned(existing, userCol, itemCol)
    val deltaUi = cleaned(delta, userCol, itemCol)
    val affected = deltaUi.select("u").distinct()
    val fullUi = oldUi.unionByName(deltaUi).distinct()

    val cappedFull = capUsers(fullUi, maxUserItems)
    // minCo must apply AFTER the union of the two count sources: a
    // pair can clear the threshold only jointly, so both branches
    // count with minCo = 1 and the threshold gates the merged counts
    val coUnaffected = pairCounts(
      capUsers(oldUi.join(affected, Seq("u"), "left_anti"),
        maxUserItems), minCo = 1L)
    val coAffected = pairCounts(cappedFull.join(affected, Seq("u")),
      minCo = 1L)
    val co = coUnaffected.unionByName(coAffected)
      .groupBy("ia", "ib").agg(sum("co").as("co"))
      .where(col("co") >= minCo)
    score(co, cappedFull.groupBy("i").agg(count(lit(1)).as("n_i")),
      topN)
  }
}
