package graft

import org.apache.spark.sql.functions._

/** Scale probe for the two-level coarse quantizer: wall seconds of
  * flat [[graft.operators.Ann.ivfTopK]] vs
  * [[graft.operators.Ann.ivf2TopK]] end-to-end (assignment + probe +
  * re-rank) at a given cell count, on the embeddings corpus
  * optionally replicated `mult`x (ids offset per replica). Flat IVF's
  * assignment is an O(nCells)-literal projection per corpus row, so
  * its wall grows linearly in nCells at fixed data; the two-level
  * path scores O(nCoarse + nCells/nCoarse) per row (nCoarse =
  * sqrt(nCells) here) and should hold near-flat — the probe exists so
  * PLANS.md can state that from numbers, not the formula.
  *
  * Usage: runMain graft.Ivf2Probe [dir] [nCells] [mult]
  */
object Ivf2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nCells = args.lift(1).map(_.toInt).getOrElse(64)
    val mult = args.lift(2).map(_.toInt).getOrElse(1)
    val nCoarse = math.max(1, math.sqrt(nCells.toDouble).round.toInt)
    val spark = SparkBoot.session(SparkBoot.cpus())
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = base.count()
    val e = (1 until mult).foldLeft(base) { (acc, i) =>
      acc.unionByName(base.select(
        (col("vec_id") + lit(i * baseN)).as("vec_id"), col("embedding")))
    }
    val q = base.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // cold run carries JIT/codegen warmup; ratios read the warm one
    def flat() = graft.operators.Ann.ivfTopK(q, e, k = 5,
      nCells = nCells, nProbe = 2).count()
    def two() = graft.operators.Ann.ivf2TopK(q, e, k = 5,
      nCells = nCells, nCoarse = nCoarse, wProbe = 2, nProbe = 2).count()
    val (rowsF, flatCold) = time(flat())
    val (_, flatWarm) = time(flat())
    val (rows2, twoCold) = time(two())
    val (_, twoWarm) = time(two())
    println(s"""{"dir":"$dir","n_vecs":${baseN * mult},""" +
      s""""n_cells":$nCells,"n_coarse":$nCoarse,"mult":$mult,""" +
      s""""rows_flat":$rowsF,"sec_flat_cold":$flatCold,""" +
      s""""sec_flat":$flatWarm,"rows_ivf2":$rows2,""" +
      s""""sec_ivf2_cold":$twoCold,"sec_ivf2":$twoWarm}""")
    spark.stop()
  }
}
