package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout over logged per-unit metrics — the analysis
  * step downstream of the recommender the reference ships payloads
  * for: per-arm moments and Welch (unequal-variance) comparisons of
  * every treatment arm against a control.
  *
  * Scale + determinism shape: ONE map-side-combinable aggregation
  * keyed by arm computes exact decimal (n, Σy, Σy²) — decimal(18,6)
  * inputs, exact (37,12) squares, order-free sums — and everything
  * downstream (means, variances, lifts, standard errors, t statistics)
  * is a fixed IEEE expression tree over those exact moments: add,
  * subtract, multiply, divide, sqrt are all correctly rounded, so the
  * readout is bit-identical under any partitioning and replayable by a
  * SQL oracle. The arm table is arms-sized (a handful of rows); the
  * control row joins back by broadcast.
  */
object Experiment {

  private def moments(log: DataFrame, armCol: String, valueCol: String)
      : DataFrame = {
    val y = col(valueCol).cast("decimal(18,6)")
    log.where(col(armCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("s"), sum(y * y).as("ss"))
  }

  private def meanCol: Column = col("s").cast("double") /
    col("n").cast("double")

  /** Unbiased sample variance from the exact moments:
    * (Σy² - (Σy)²/n) / (n-1); null for singleton arms.
    */
  private def varCol: Column =
    when(col("n") > 1,
      (col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double") /
          col("n").cast("double")) /
        (col("n") - lit(1L)).cast("double"))

  /** Per-arm (arm, n, mean, variance), 6-decimal, ordered by arm. */
  def armSummary(log: DataFrame, armCol: String, valueCol: String)
      : DataFrame =
    moments(log, armCol, valueCol)
      .select(col("arm"), col("n"), round(meanCol, 6).as("mean"),
        round(varCol, 6).as("variance"))
      .orderBy("arm")

  /** Welch comparison of every non-control arm against `controlArm`:
    * absolute and relative lift, the unequal-variance standard error
    * se = sqrt(var_t/n_t + var_c/n_c), and the Welch t statistic.
    * Arms need n >= 2 on both sides for se/t (null otherwise);
    * relative lift is null when the control mean is exactly 0.
    *
    * @return one row per treatment arm, ordered by arm:
    *         (arm, n_t, n_c, mean_t, mean_c, lift_abs, lift_rel, se,
    *         t_stat), 6-decimal doubles.
    */
  def compare(log: DataFrame, armCol: String, valueCol: String,
      controlArm: String): DataFrame = {
    val m = moments(log, armCol, valueCol)
      .select(col("arm"), col("n"), meanCol.as("mean"),
        varCol.as("vr"))
    val c = m.where(col("arm") === controlArm)
      .select(col("n").as("n_c"), col("mean").as("mean_c"),
        col("vr").as("var_c"))
    val t = m.where(col("arm") =!= controlArm)
    val se = sqrt(col("vr") / col("n").cast("double") +
      col("var_c") / col("n_c").cast("double"))
    t.crossJoin(broadcast(c))
      .select(col("arm"), col("n").as("n_t"), col("n_c"),
        round(col("mean"), 6).as("mean_t"),
        round(col("mean_c"), 6).as("mean_c"),
        round(col("mean") - col("mean_c"), 6).as("lift_abs"),
        round(when(col("mean_c") =!= 0.0,
          (col("mean") - col("mean_c")) / col("mean_c")), 6)
          .as("lift_rel"),
        round(se, 6).as("se"),
        round((col("mean") - col("mean_c")) / se, 6).as("t_stat"))
      .orderBy("arm")
  }
}
