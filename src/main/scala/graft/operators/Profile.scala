package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the per-column statistics a pipeline's data-quality
  * gate checks before training ingestion (null fractions, key
  * cardinality, value ranges).
  */
object Profile {

  /** One-pass column profile: per column the row count, null count,
    * distinct count, and min/max rendered as strings (the long format
    * needs one common type; callers pre-cast columns whose native
    * string rendering is engine-ambiguous, e.g. doubles to DECIMAL).
    *
    * Single aggregation job over the input. The multiple COUNT
    * DISTINCTs plan through Spark's Expand (input rows replicated once
    * per distinct-column) — the standard exact shape; at 100 TB
    * profile a sample or swap `exact = false` for
    * approx_count_distinct, which drops Expand entirely (HLL partials
    * merge map-side) at ~2% error.
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns
    val nd = (c: String) =>
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        nd(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }.toIndexedSeq
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __nn_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_str, max_str)")
      .select(col("col_name"), col("__n").as("n_rows"),
        col("n_nulls").cast("long").as("n_nulls"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("min_str"), col("max_str"))
  }
}
