package graft

import org.apache.spark.sql.functions._

/** Delta-regime scale probe for incremental item-CF (VERDICT r20 #1
  * "done" evidence): with the pair-count state PERSISTED (built once,
  * untimed — the daily job reads yesterday's table), how does the
  * per-delta maintenance cost of
  * [[graft.operators.ItemSim.cosineNeighborsFromState]] scale when the
  * log grows Nx while the delta stays fixed-size?
  *
  * The log is scaled by replicating the (user, item) matrix with
  * user-id offsets (N disjoint user populations with x1's per-user
  * histories) — StressScale's fixtures deliberately keep o_custkey
  * unshifted (replica-invariant matrices, right for the batch query's
  * scan-growth measurement) and so cannot grow the pair fan-out this
  * probe needs to demonstrate independence from. The delta is the
  * replica-0 1998 orders of the `user_id % 101 == 0` user slice —
  * byte-identical at every factor.
  *
  * Prints one JSON line per factor with the maintenance seconds, the
  * batch-rebuild seconds on the same corpus (what a deployment
  * otherwise pays daily), and the certifying row counts. Dev probe —
  * not part of the driver contract.
  *
  * Usage: runMain graft.ItemCfDeltaProbe <dir> [factor ...]
  *   factors default to 1 10
  */
object ItemCfDeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 10)
    val spark = SparkBoot.session(SparkBoot.cpus(), logLevel = "ERROR")
    import graft.operators.ItemSim
    val fact = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("item_id"), col("o_orderdate"))
    val isDelta = col("o_orderdate") >= to_timestamp(lit("1998-01-01")) &&
      pmod(col("user_id"), lit(101)) === 0
    factors.foreach { n =>
      val scaled = fact
        .withColumn("r", explode(sequence(lit(0), lit(n - 1))))
        .select((col("user_id") + col("r") * 10000000L).as("user_id"),
          col("item_id"), col("o_orderdate"))
      // the fixed delta lives in replica 0 only
      val deltaCond = isDelta && col("user_id") < 10000000L
      val existing = scaled.where(!deltaCond)
        .select("user_id", "item_id")
      val delta = scaled.where(deltaCond).select("user_id", "item_id")
      val nExisting = existing.count()
      val nDelta = delta.count()
      // state build: ONCE, untimed, persisted — the regime's premise
      val (pairs0, sup0) = ItemSim.pairCountState(existing)
      val pairs = pairs0.persist(); val sup = sup0.persist()
      val nState = pairs.count(); sup.count()
      def timeMin(reps: Int)(f: => Unit): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val tMaint = timeMin(3) {
        ItemSim.cosineNeighborsFromState(pairs, sup, existing, delta)
          .queryExecution.toRdd.count()
      }
      val tRebuild = timeMin(3) {
        ItemSim.cosineNeighbors(existing.unionByName(delta))
          .queryExecution.toRdd.count()
      }
      println(s"""{"dir":"$dir","factor":$n,"n_existing":$nExisting,""" +
        s""""n_delta":$nDelta,"n_state_pairs":$nState,""" +
        s""""sec_maintenance":$tMaint,"sec_rebuild":$tRebuild}""")
      pairs.unpersist(); sup.unpersist()
    }
    spark.stop()
  }
}
