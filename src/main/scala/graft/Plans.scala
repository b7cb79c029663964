package graft
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkBoot.session("8", logLevel = "ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q_ri_pipeline", "q_delta_keyed", "q_ann_brute",
        "q_dedup_minhash", "q_events_window")) {
      println(s"########## $name")
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // compact: keep operator lines only
      plan.split("\n").filter(l => l.contains("(") || l.contains("+-") ||
        l.contains(":-")).take(45).foreach(println)
    }
    spark.stop()
  }
}
