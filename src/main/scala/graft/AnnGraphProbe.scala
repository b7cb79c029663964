package graft

import org.apache.spark.sql.functions._

/** Scale probe for the graph-expansion ANN family: edge count and
  * wall seconds of the [[graft.operators.Ann.knnGraph]] build, plus
  * the end-to-end [[graft.operators.Ann.graphExpandTopK]] search,
  * at a given embeddings dir and cell count. The build's cost law is
  * sum(|cell|^2): with nCells FIXED, 10x data makes cells 10x larger
  * and the build ~100x — the probe exists to measure that bend and
  * the sqrt(N)-cells mitigation (|cell| ~ sqrt(N) holds per-cell work
  * near-linear) side by side, so PLANS.md can state the law from
  * numbers, not the formula.
  *
  * Usage: runMain graft.AnnGraphProbe [dir] [nCells] [kG]
  */
object AnnGraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nCells = args.lift(1).map(_.toInt).getOrElse(16)
    val kG = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkBoot.session(SparkBoot.cpus())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nVecs = e.count()
    // cold sample carries JIT+codegen warmup; the warm sample is the
    // one the scaling ratios read
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (edges, buildCold) =
      time(graft.operators.Ann.knnGraph(e, kG, nCells).count())
    val (_, buildWarm) =
      time(graft.operators.Ann.knnGraph(e, kG, nCells).count())
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def search() = graft.operators.Ann.graphExpandTopK(q, e, k = 5,
      nCells = nCells, nProbe = 1, beam = 5, hops = 1, kG = kG).count()
    val (rows, searchCold) = time(search())
    val (_, searchWarm) = time(search())
    println(s"""{"dir":"$dir","n_vecs":$nVecs,"n_cells":$nCells,""" +
      s""""k_g":$kG,"n_edges":$edges,"sec_build_cold":$buildCold,""" +
      s""""sec_build":$buildWarm,"search_rows":$rows,""" +
      s""""sec_search_cold":$searchCold,"sec_search_e2e":$searchWarm}""")
    spark.stop()
  }
}
