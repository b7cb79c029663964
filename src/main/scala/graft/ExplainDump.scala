package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries
  * (the .explain audit PLANS.md notes come from). Not part of the
  * driver contract.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <q_name> [<q_name> ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
