package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: the per-column statistics a pipeline's data-quality
  * gate checks before training ingestion (null fractions, key
  * cardinality, value ranges).
  */
object Profile {

  /** Column profile: per column the row count, null count, distinct
    * count, and min/max rendered as strings (the long format needs one
    * common type; callers pre-cast columns whose native string
    * rendering is engine-ambiguous, e.g. doubles to DECIMAL).
    *
    * One union branch per column, each a partial/final HashAggregate
    * over a single-column (parquet-pruned) scan — total I/O equals one
    * scan of the profiled columns. Deliberately NOT one wide aggregate
    * with N count-distincts: that plans through Expand (every full-
    * width row replicated N+1 times into a SortAggregate), measured 2x
    * slower at sf0.1 and strictly worse at scale. `exact = false`
    * swaps HLL approx_count_distinct in (~2% error) — at 100 TB the
    * lever when exact key cardinality isn't required.
    */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame =
    df.columns.toIndexedSeq.map { c =>
      val nd =
        if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      df.select(col(c)).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          nd.as("n_distinct"),
          min(col(c)).cast("string").as("min_str"),
          max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"),
          col("n_nulls").cast("long").as("n_nulls"),
          col("n_distinct").cast("long").as("n_distinct"),
          col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
}
