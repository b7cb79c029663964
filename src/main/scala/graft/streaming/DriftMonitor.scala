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
    // NULL metric values carry no bin (same contract as
    // Profile.histogram) — without this filter they'd form a
    // (window, NULL-bin) row that score() grades against an n_base of
    // 0, inflating PSI (ADVICE r10)
    src.where(col(valueCol).isNotNull)
      .withWatermark(tsCol, watermark)
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
    * the baseline as side A. Every window scores EXACTLY the grid
    * 0..bins-1 (ADVICE r10, same reasoning as the batch operator): a
    * bin the window left empty still carries smoothing mass against
    * the baseline's share, so each window's summed `psi` is the true
    * full-grid PSI. Stream values outside the baseline's grid (past
    * its max, or below the caller's `mn`) CLAMP into the edge bins —
    * the standard histogram overflow bucket — so their mass stays in
    * the window's shares and shows up as edge-bin drift instead of
    * either vanishing or producing rows the fixed grid doesn't define
    * (ADVICE r11: the previous behavior emitted occupied out-of-grid
    * bins, which the shares' `bins` denominator never accounted for).
    * An all-empty window emits nothing (it has no row in `winBins` to
    * anchor the grid).
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
    val nbRow = baseline.agg(sum("n_base")).head()
    require(!nbRow.isNullAt(0), "baseline is empty — nothing to score against")
    val nBase = nbRow.getLong(0)
    // overflow clamp: out-of-grid occupancy folds into the edge bins
    // and re-aggregates, so every scored row is a defined grid bin
    val clamped = winBins.select(col("win_start_us"),
        greatest(lit(0L), least(col("bin"), lit((bins - 1).toLong)))
          .as("bin"), col("n"))
      .groupBy("win_start_us", "bin").agg(sum("n").as("n"))
    // renamed keys before the self-derived joins: a memory-sink input
    // carries identical attribute ids on both branches otherwise
    val grid = clamped.select(col("win_start_us").as("__gw")).distinct()
      .select(col("__gw"),
        explode(sequence(lit(0L), lit((bins - 1).toLong))).as("__gb"))
    val full = grid.join(clamped,
        col("__gw") === col("win_start_us") && col("__gb") === col("bin"),
        "left_outer")
      .select(col("__gw").as("win_start_us"), col("__gb").as("bin"),
        coalesce(col("n"), lit(0L)).as("n"))
    val totals = clamped.select(col("win_start_us").as("__w"), col("n"))
      .groupBy("__w").agg(sum("n").as("n_win"))
    full
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
