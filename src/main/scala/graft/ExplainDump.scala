package graft


/** Dev tool: print the formatted physical plan of registered queries
  * (the .explain audit PLANS.md notes come from). Not part of the
  * driver contract.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <q_name> [<q_name> ...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark =
      SparkBoot.session(SparkBoot.cpus(default = 4), logLevel = "ERROR")
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
