package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitoring — the continuous-ingestion
  * side of [[graft.operators.Profile.distributionDrift]]: each
  * event-time window's metric distribution is binned as it closes, and
  * scored against a frozen baseline. The alert a 100 TB ingest
  * pipeline wants is "this hour's document-length / score / value
  * distribution stopped looking like the corpus" — cheap enough to run
  * on every window, engine-exact so the same windows score the same
  * everywhere.
  */
object DriftMonitor {

  /** Streaming stage: watermarked tumbling-window equi-width bin
    * counts of an integer metric. Bin arithmetic is the
    * [[graft.operators.Profile.histogram]] integer grid (caller fixes
    * `mn`/`binWidth` from the baseline, so stream and baseline share
    * the grid by construction); output is append-only — a
    * (window, bin, count) row emits exactly once, when the watermark
    * closes the window.
    *
    * Scale shape: the ONLY state is the open windows' bin counts
    * (windows x bins longs — bounded by the watermark horizon, never
    * by throughput), and the aggregation is map-side combinable
    * before the (window, bin) shuffle.
    *
    * @return (win_start_us epoch-micros, bin, n) per closed window
    */
  def windowedBins(src: DataFrame, tsCol: String, valueCol: String,
      windowDur: String, watermark: String, mn: Long,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be > 0")
    src.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"),
        expr(s"(CAST(`$valueCol` AS BIGINT) - ${mn}L) div ${binWidth}L")
          .as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("bin"), col("n"))
  }

  /** Scoring stage over the CLOSED windows (a batch frame — e.g. the
    * memory/Delta sink [[windowedBins]] feeds): add-1-smoothed PSI of
    * each window's bin shares against the baseline's, the
    * [[graft.operators.Profile.distributionDrift]] expression with
    * the baseline as side A. Only bins the window OCCUPIES are
    * scored (an all-empty window emits nothing to score); `bins` is
    * the grid's nominal bin count, used as the smoothing mass so the
    * shares match the batch operator's.
    *
    * Input sizes here are windows x bins — driver-trivial; the heavy
    * lifting already happened in the stream.
    *
    * @param baseline (bin, n_base) counts of the reference corpus
    * @return (win_start_us, bin, n, n_base, psi)
    */
  def score(winBins: DataFrame, baseline: DataFrame,
      bins: Int): DataFrame = {
    require(bins > 0, "bins must be > 0")
    val nbRow = baseline.agg(sum("n_base")).head
    require(!nbRow.isNullAt(0), "baseline is empty — nothing to score against")
    val nBase = nbRow.getLong(0)
    // renamed key before the self-derived join: a memory-sink input
    // carries identical attribute ids on both branches otherwise
    val totals = winBins.select(col("win_start_us").as("__w"), col("n"))
      .groupBy("__w").agg(sum("n").as("n_win"))
    winBins
      .join(totals, col("win_start_us") === col("__w"))
      .drop("__w")
      .join(broadcast(baseline), Seq("bin"), "left_outer")
      .withColumn("n_base", coalesce(col("n_base"), lit(0L)))
      .withColumn("pw",
        (col("n") + 1L).cast("double") / (col("n_win") + bins))
      .withColumn("pb",
        (col("n_base") + 1L).cast("double") / lit(nBase + bins))
      .select(col("win_start_us"), col("bin"), col("n"), col("n_base"),
        round((col("pw") - col("pb")) * log(col("pw") / col("pb")), 9)
          .as("psi"))
  }
}
