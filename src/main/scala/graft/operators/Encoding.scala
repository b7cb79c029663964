package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encoding for training-data preparation:
  * smoothed target (mean) encoding and its leakage-free row-level
  * variant, leave-one-out. The standard trick for high-cardinality
  * categoricals (user segment, item source, supplier) ahead of
  * gradient-boosted / linear models — replaces the category with a
  * shrunk estimate of E[target | category].
  *
  * Scale shape: target encoding is ONE map-side-combinable aggregation
  * keyed by the category (plus one scalar global-mean aggregate
  * broadcast back); leave-one-out joins those per-category sums back
  * to the rows on the category key — one shuffle each side, or a
  * broadcast when the category table is dimension-sized. No window,
  * no collect.
  *
  * Determinism: per-category target sums accumulate in
  * `decimal(18,6)` (order-free); every derived estimate is a fixed
  * expression tree of IEEE add/multiply/divide over those exact sums,
  * so results are bit-identical under any partitioning.
  */
object Encoding {

  /** Per-category smoothed mean encoding:
    * `enc(c) = (sum_c + prior * m) / (n_c + m)` where `prior` is the
    * global target mean and `m` the smoothing pseudo-count — category
    * means shrink toward the prior in proportion to their sparsity
    * (m = 0 gives the raw category mean).
    *
    * @return (category, n, enc) with `enc` rounded to 6 decimals,
    *         ordered by category. Null categories/targets are dropped
    *         (encode nulls upstream if they carry signal).
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      smoothing: Double = 10.0): DataFrame = {
    require(smoothing >= 0.0, s"smoothing must be >= 0, got $smoothing")
    val base = df
      .select(col(catCol).as("category"),
        col(targetCol).cast("decimal(18,6)").as("y"))
      .where(col("category").isNotNull && col("y").isNotNull)
    val per = base.groupBy("category")
      .agg(count(lit(1)).as("n"), sum("y").as("sum_y"))
    // One-row global aggregate; the cross join broadcasts it.
    val glob = base.agg((sum("y").cast("double") /
      count(lit(1)).cast("double")).as("prior"))
    per.crossJoin(broadcast(glob))
      .select(col("category"), col("n"),
        round((col("sum_y").cast("double") +
            col("prior") * lit(smoothing)) /
          (col("n").cast("double") + lit(smoothing)), 6).as("enc"))
      .orderBy("category")
  }

  /** Leave-one-out encoding: each ROW gets its category's target mean
    * computed WITHOUT the row itself — `(sum_c - y_i) / (n_c - 1)` —
    * the standard way to avoid the self-leakage that makes naive
    * target encoding overfit. Singleton categories (n_c = 1) have no
    * peers and fall back to the global prior.
    *
    * @return `df`'s rows (null category/target rows dropped) plus
    *         `loo` (6-decimal double).
    */
  def leaveOneOut(df: DataFrame, catCol: String, targetCol: String)
      : DataFrame = {
    val marked = df
      .where(col(catCol).isNotNull && col(targetCol).isNotNull)
      .withColumn("__y", col(targetCol).cast("decimal(18,6)"))
    val per = marked.groupBy(col(catCol).as("__cat"))
      .agg(count(lit(1)).as("__n"), sum("__y").as("__sum"))
    val glob = marked.agg((sum("__y").cast("double") /
      count(lit(1)).cast("double")).as("__prior"))
    marked
      .join(per, col(catCol) === col("__cat"))
      .crossJoin(broadcast(glob))
      .withColumn("loo",
        round(when(col("__n") > 1,
            (col("__sum").cast("double") - col("__y").cast("double")) /
              (col("__n") - lit(1L)).cast("double"))
          .otherwise(col("__prior")), 6))
      .drop("__y", "__cat", "__n", "__sum", "__prior")
  }
}
