package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the operational complement of
  * [[Bucketing]]/[[ZOrder]]: given a file manifest (path, bytes
  * [, partition keys]), assign every file to a rewrite bin of roughly
  * `targetBytes` so one rewrite job per bin replaces many small files
  * with one well-sized one. At 100 TB the failure mode this prevents
  * is real: a streaming sink or over-partitioned write leaves millions
  * of KB-scale files whose per-file open/footer cost dominates scans.
  *
  * Algorithm: within each table partition, order files by (bytes asc,
  * file asc) — smallest first, so the long tail of tiny files packs
  * together and already-large files fall through to their own bins —
  * take the running byte offset, and bin by `floor(offsetBefore /
  * targetBytes)`. This is the order-based packing Delta/Iceberg
  * OPTIMIZE uses in spirit, expressed as ONE window over the manifest:
  * deterministic, engine-reproducible, no sequential driver loop. A
  * bin may overflow `targetBytes` by at most one file (the straddling
  * file joins the bin its offset starts in), and a file larger than
  * the target occupies its bin alone (bin ids are then not dense —
  * they are offsets div target, not ranks).
  *
  * Scale shape: the window partitions by the TABLE partition columns,
  * so planning parallelizes across partitions — the common case, since
  * compaction never merges across partition boundaries. The unkeyed
  * form is a single-partition window: acceptable because a manifest is
  * metadata (one row per FILE, not per record — 100 TB at 128 MB/file
  * is ~800k rows); refuse to run it over record-scale input.
  */
object Compaction {

  /** Bin assignment: `manifest` plus `bin` (long, 0-based within the
    * partition) and `bin_offset` (the file's starting byte offset in
    * its partition's packing order — the quantity the bin is derived
    * from, useful for audits).
    *
    * @param targetBytes   desired rewritten file size (> 0).
    * @param partitionCols table partition columns to plan within; empty
    *                      means one global packing order.
    */
  def plan(manifest: DataFrame, fileCol: String, sizeCol: String,
      targetBytes: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(sizeCol).asc, col(fileCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .where(col(fileCol).isNotNull && col(sizeCol) >= 0)
      .withColumn("bin_offset",
        sum(col(sizeCol).cast("long")).over(w) - col(sizeCol).cast("long"))
      // true integer division (offsets are non-negative) — no double
      // round-trip on what is a byte offset at 100 TB scale
      .withColumn("bin", expr(s"bin_offset div ${targetBytes}L"))
  }

  /** Per-bin rollup of a [[plan]]: files, bytes, and whether the bin
    * is worth rewriting (more than one file — single-file bins are
    * already compact). One map-side-combinable aggregation.
    */
  def summary(planned: DataFrame, sizeCol: String,
      partitionCols: Seq[String] = Nil): DataFrame =
    planned
      .groupBy((partitionCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol).cast("long")).as("bin_bytes"))
      .withColumn("rewrite", col("n_files") > 1)
}
