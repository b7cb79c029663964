package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.Intervals.overlapJoin]]: wall
  * seconds of the bucketed emit-once join vs the naive per-key
  * equi-join + overlap filter, on deterministic synthetic intervals
  * (hash-generated — no RNG). The naive shape's candidate volume is
  * sum over keys of |L_k| x |R_k| — quadratic per key, intractable
  * once a key holds millions of intervals; the bucketed shape pays
  * replication (len/span + 1 per row) plus only the per-(key, bucket)
  * products, which track the MATCHED volume when span ~ interval
  * length. The probe exists so PLANS.md can state that law from
  * numbers.
  *
  * Usage: runMain graft.IntervalProbe [n] [keys] [range] [maxLen]
  *          [span] [naive 0/1]
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val keys = args.lift(1).map(_.toInt).getOrElse(100)
    val range = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val maxLen = args.lift(3).map(_.toLong).getOrElse(1000L)
    val span = args.lift(4).map(_.toLong).getOrElse(2000L)
    val naive = args.lift(5).map(_.toInt).getOrElse(0) == 1
    val spark = SparkBoot.session(SparkBoot.cpus())

    def gen(rows: Int, idBase: Long, name: String): DataFrame =
      spark.range(rows).select(
        pmod(xxhash64(col("id") + idBase), lit(keys.toLong)).as("k"),
        (col("id") + idBase).as(name),
        pmod(xxhash64(col("id") * 7 + idBase), lit(range)).as("s0"),
        pmod(xxhash64(col("id") * 13 + idBase), lit(maxLen + 1)).as("len"))
        .select(col("k"), col(name), col("s0").as(s"${name}_s"),
          (col("s0") + col("len")).as(s"${name}_e"))
    val l = gen(n, 1L, "lid").persist()
    val r = gen(n, 1000000000L, "rid").persist()
    l.count(); r.count() // pin the inputs out of both measurements

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = f
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def bucketed() = graft.operators.Intervals.overlapJoin(l, r,
      Seq("k"), "lid_s", "lid_e", "rid_s", "rid_e", span).count()
    val (matches, cold) = time(bucketed())
    val (_, warm) = time(bucketed())
    val (naiveRows, naiveSec) = if (naive) {
      time(l.join(r, Seq("k"))
        .where(col("lid_s") <= col("rid_e") && col("rid_s") <= col("lid_e"))
        .count())
    } else (-1L, -1.0)
    println(s"""{"n":$n,"keys":$keys,"range":$range,""" +
      s""""max_len":$maxLen,"span":$span,"matches":$matches,""" +
      s""""sec_bucketed_cold":$cold,"sec_bucketed":$warm,""" +
      s""""naive_matches":$naiveRows,"sec_naive":$naiveSec}""")
    spark.stop()
  }
}
