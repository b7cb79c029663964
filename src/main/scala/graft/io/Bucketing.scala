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
}
