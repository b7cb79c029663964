package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Ops

/** Dev-only stage profiler (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    // warm
    Queries.riPipeline(spark, dir).count()

    time("full")(Queries.riPipeline(spark, dir).count())
    time("riBatch")(Queries.riBatch(spark, dir).count())
    val (ok, _) = Ops.splitErrors(Queries.riBatch(spark, dir))
    time("split_ok")(ok.count())
    time("mapping")(Queries.riMapping(spark, dir).count())
    val merged = Ops.mapUsers(ok, Queries.riMapping(spark, dir))
    time("mapUsers")(merged.count())
    val exploded = Ops.explodeRecs(merged, "input.itemId", "queryItemId",
      Seq("USER_ID" -> "userId"))
    time("exploded")(exploded.count())
    val decorated = Ops.decorate(exploded,
      Some(Queries.partMetadata(spark, dir)), Seq("p_brand"))
    time("decorated")(decorated.count())
    val assembled = Ops.assembleRecommendations(decorated,
      Seq("queryItemId", "userId"))
    time("assembled")(assembled.count())
    time("full2")(Queries.riPipeline(spark, dir).count())
    spark.stop()
  }
}
