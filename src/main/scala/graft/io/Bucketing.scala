package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: pre-partition fact tables on their join key
  * at WRITE time so repeated joins/aggregations on that key never
  * shuffle again — the standard way to amortize the biggest cost of a
  * 100 TB pipeline across runs. A bucketed+sorted table carries its
  * hash distribution in the catalog; a join of two tables bucketed on
  * the join key with the same bucket count runs Exchange-free (asserted
  * in PlanRegressionSpec).
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed and sorted on
    * `bucketCol`. `nBuckets` sets the unit of join parallelism for every
    * later reader — size it to the TARGET scale (data / nBuckets should
    * fit an executor's memory), not the writer's partition count.
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tableName)
  }

  /** Write `df` as plain parquet files range-partitioned AND sorted on
    * `sortCol` — the data-skipping layout. Each output file covers a
    * disjoint `sortCol` span (equal keys cannot straddle a range
    * boundary) and is internally sorted, so every file footer and
    * row-group carries tight min/max stats: a later
    * `WHERE sortCol = x / BETWEEN a AND b` scan prunes whole files and
    * row-groups instead of reading the table. At 100 TB this layout
    * pass is what turns point-lookup and range workloads from full
    * scans into a handful of row-groups; it costs one range exchange
    * (sampled boundaries) plus a per-partition sort, both streaming.
    * Unlike [[writeBucketed]] it needs no catalog — the stats ARE the
    * index — but repeated equi-JOINS should prefer the bucketed form,
    * which carries a hash distribution the planner can use.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
}
