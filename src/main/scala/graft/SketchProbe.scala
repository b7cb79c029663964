package graft

import org.apache.spark.sql.functions._

/** Scale probe for the round-19 sketch operators
  * ([[graft.operators.Quantiles]], [[graft.operators.JoinAdvisor]],
  * [[graft.operators.Sketches.kmvOverlap]]): wall seconds at a given
  * synthetic row count (hash-generated, no RNG), so PLANS.md can
  * state the cost law from numbers. Each operator's claim is
  * one-narrow-scan + bounded shuffle/collect (k sample rows, 2^p
  * registers, k hash minima respectively) — so wall time must track
  * the SCAN, i.e. stay ~linear in n with a flat constant, at any n.
  *
  * Usage: runMain graft.SketchProbe [n]
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val spark = SparkBoot.session(SparkBoot.cpus())

    val df = spark.range(n).select(
        col("id"),
        pmod(xxhash64(col("id")), lit(8L)).as("g"),
        (pmod(xxhash64(col("id") * 7), lit(1000000L)).cast("double") /
          lit(1000.0)).as("v"),
        pmod(xxhash64(col("id") * 13), lit(n / 10 + 1)).as("k"))
      .persist()
    df.count() // pin the input out of every measurement

    def time(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val qSec = time {
      graft.operators.Quantiles.sketchQuantiles(df, Seq("g"), "v",
        "id", k = 8192, permilles = Seq(100, 500, 900)).count()
    }
    val aSec = time {
      graft.operators.JoinAdvisor.profile(df, "k", p = 12)
    }
    val oSec = time {
      graft.operators.Sketches.kmvOverlap(
        df.where(col("id") % 2 === 0), df.where(col("id") % 2 === 1),
        "k", "k", k = 8192).count()
    }
    val mSec = time {
      graft.operators.Quantiles.madOutliersSketch(df, "v", "id",
        k = 3.0, sketchK = 8192).count()
    }
    println(s"""{"n":$n,"sec_quantile_sketch":$qSec,""" +
      s""""sec_join_profile":$aSec,"sec_kmv_overlap":$oSec,""" +
      s""""sec_mad_sketch":$mSec}""")
    spark.stop()
  }
}
