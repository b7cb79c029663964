package graft

import org.apache.spark.sql.SparkSession

/** One place for the local session every driver-facing main boots
  * (round-16 review: this block had drifted into six inline copies —
  * Bench, Verify, JaccardProbe, StressScale, ExplainDump, Plans — and
  * a config change missed in one of them makes that main's
  * measurements silently non-comparable to the others').
  *
  * The settings themselves: one shuffle partition per core (the
  * 100 TB analogue is partitions ~= 2-3x total executor cores —
  * local[n] models that as n), UTC so timestamp renders match the
  * DuckDB oracle, `nanosAsLong` because events.parquet carries
  * TIMESTAMP(NANOS) which Spark's reader only surfaces as a
  * nano-count long, UI off for headless runs.
  */
object SparkBoot {

  /** Cores from SPARK_GRAFT_CPUS (driver contract) over `default`. */
  def cpus(default: Int = 32): String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", default.toString)

  /** Build the standard local session.
    *
    * @param cores              local[n] parallelism
    * @param shufflePartitions  defaults to `cores`
    * @param logLevel           sparkContext log level after boot
    */
  def session(cores: String, shufflePartitions: Option[String] = None,
      logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }
}
