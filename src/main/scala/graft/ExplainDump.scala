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
    // full plans wanted here: undo the SparkBoot render cap (runtime conf)
    spark.conf.set("spark.sql.maxPlanStringLength",
      (Int.MaxValue - 16).toString)
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
