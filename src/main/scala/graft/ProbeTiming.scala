package graft

import org.apache.spark.sql.functions._

/** Throwaway timing harness for ShapeSelect.decide at a given dir. */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf10-events")
    val spark = SparkBoot.session(SparkBoot.cpus())
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ev = raw.select(
        col("user_id"), col("event_id"),
        graft.operators.Events.tsMicros(raw).as("ts_us"))
      .withColumn("ts_s", expr("ts_us div 1000000"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val d = graft.operators.ShapeSelect.decide(ev, Seq("user_id"), "ts_s")
      println(f"decide run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"bucketed=${d.bucketed} share=${d.topShare}")
    }
    // the routed operator alone, for the subtraction
    val t1 = System.nanoTime()
    graft.operators.Events.sessionizeBucketed(ev, "user_id", "ts_s",
      30, Seq("ts_us", "event_id"), 86400L)
      .queryExecution.toRdd.count()
    println(f"bucketed sessionize alone: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val t2 = System.nanoTime()
    graft.operators.Events.sessionizeAuto(ev, "user_id", "ts_s",
      30, Seq("ts_us", "event_id"), 86400L)
      .queryExecution.toRdd.count()
    println(f"auto sessionize total: ${(System.nanoTime() - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
