package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stress-data scaler: writes an N-times-larger copy of a testdata
  * directory for superlinearity checks (VERDICT r10 item 7 — "does the
  * heavy tail stay ~linear at 10x data?"). FACT tables replicate with
  * key offsets (each replica's join keys shift by `i * stride`, so
  * fact-to-fact joins like orders-lineitem keep exactly their 1:1
  * per-replica semantics and aggregate cardinalities scale by N);
  * DIMENSION tables (part, customer, supplier, nation, region) copy
  * unscaled — 10x facts over a fixed dimension population is how real
  * warehouses grow, and it preserves dimension-join hit rates.
  * Foreign keys INTO dimensions (o_custkey, l_partkey) are left
  * unshifted for the same reason.
  *
  * The output is a bench input, not a correctness fixture — oracle
  * queries keep running against the driver's own testdata.
  *
  * Usage: runMain graft.StressScale [srcDir] [dstDir] [factor]
  */
object StressScale {
  private def replicate(df: DataFrame, factor: Int,
      offsets: Map[String, Long]): DataFrame = {
    // one row per (row, replica) pair via a codegen'd explode — no
    // driver loop, no union of N plans
    val exploded = df.withColumn("__rep",
      explode(sequence(lit(0L), lit(factor - 1L))))
    offsets.foldLeft(exploded) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + col("__rep") * stride)
    }.drop("__rep")
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = spark.read.parquet(s"$src/$n.parquet")
    // strides: a round power of ten above the source's max key keeps
    // replica key ranges disjoint and human-readable
    def stride(df: DataFrame, c: String): Long = {
      // getAs[Number] + null check, not getLong: an empty source table
      // or a non-bigint key column should name the column, not NPE
      // (ADVICE r11 — dev tool, a clear failure is enough)
      val row = df.agg(max(col(c))).head
      require(!row.isNullAt(0),
        s"stride: key column `$c` has no non-null values (empty table?)")
      val mx = row.get(0) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"stride: key column `$c` must be integral, got " +
            s"${other.getClass.getSimpleName} ($other)")
      }
      var s = 10L
      while (s <= mx) s *= 10
      s
    }
    val orderStride = stride(t("orders"), "o_orderkey")
    val facts: Seq[(String, Map[String, Long])] = Seq(
      // o_custkey/l_partkey unshifted: FKs into fixed dimensions
      "orders" -> Map("o_orderkey" -> orderStride),
      "lineitem" -> Map("l_orderkey" -> orderStride),
      "events" -> Map(
        "event_id" -> stride(t("events"), "event_id"),
        "user_id" -> stride(t("events"), "user_id")),
      "documents" -> Map("doc_id" -> stride(t("documents"), "doc_id")),
      // embeddings stride must clear vecsWithTwins' +100000 twin range
      "embeddings" -> Map("vec_id" ->
        math.max(stride(t("embeddings"), "vec_id"), 1000000L)))
    val dims = Seq("part", "customer", "supplier", "nation", "region")
    for ((n, off) <- facts) {
      replicate(t(n), factor, off)
        .write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n x$factor -> $dst/$n.parquet")
    }
    for (n <- dims) {
      t(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n (dim, unscaled) -> $dst/$n.parquet")
    }
    spark.stop()
  }
}
