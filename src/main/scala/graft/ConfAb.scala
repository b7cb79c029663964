package graft

/** Dev tool: interleaved A/B of a runtime SQL conf over registered
  * queries — alternating the two values rep-by-rep inside ONE JVM so
  * slow ambient-load drift hits both arms equally (the r21 box showed
  * 2-6 ambient cores varying minute-to-minute, which poisons
  * sequential-run comparisons). Prints min/median per arm per query.
  *
  * Usage: runMain graft.ConfAb <sfDir> <confKey> <valA> <valB> <q,...> [reps]
  */
object ConfAb {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, key, va, vb, qcsv) = args.take(5)
    val reps = args.lift(5).map(_.toInt).getOrElse(4)
    val spark = SparkBoot.session(SparkBoot.cpus(), logLevel = "ERROR")
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    def once(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      once(name) // warm
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to reps) {
        spark.conf.set(key, va); a += once(name)
        spark.conf.set(key, vb); b += once(name)
      }
      def mm(xs: Seq[Double]) =
        f"min=${xs.min}%6.2f med=${xs.sorted.apply(xs.size / 2)}%6.2f"
      println(f"$name%-28s A($va) ${mm(a.toSeq)}   B($vb) ${mm(b.toSeq)}  " +
        f"ratio(minA/minB)=${a.min / b.min}%5.2f")
    }
    spark.stop()
  }
}
