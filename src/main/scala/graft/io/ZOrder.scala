package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the MULTI-column data-skipping layout.
  * [[Bucketing.writeRangeSorted]] gives one column tight per-file
  * min/max stats; a 100 TB table queried by BOTH user and time (or
  * lat/lon, tenant/date) needs locality in two dimensions at once.
  * Interleaving the bits of the two keys maps 2-D proximity onto 1-D
  * proximity, so range-partitioning + sorting on the z-value bounds
  * EVERY file's footer stats on BOTH columns — a predicate on either
  * dimension (or both) prunes files, where a single-column sort leaves
  * the second dimension's span per file unbounded.
  *
  * The z-value is five shift-or-mask steps per column (the standard
  * bit-spreading sequence), all `bitwiseAND`/`shiftleft` built-ins —
  * fully codegen'd, no UDF, and exactly reproducible in any engine
  * with 64-bit integer ops.
  */
object ZOrder {

  private val Steps = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** The low 31 bits of `v` spread onto even bit positions 0,2,..,60. */
  private def spread(v: Column): Column =
    Steps.foldLeft(v.bitwiseAND(lit(0x7FFFFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton interleave of two non-negative 31-bit keys: x on even
    * bits, y on odd bits — z stays in [0, 2^62), always positive.
    * Values wider than 31 bits are clustered by their LOW 31 bits
    * (the mask keeps the expression total rather than overflowing);
    * pre-scale or bucket wider domains first.
    */
  def zValue(x: Column, y: Column): Column =
    spread(x.cast("long"))
      .bitwiseOR(shiftleft(spread(y.cast("long")), 1))

  /** Write `df` as plain parquet files range-partitioned AND sorted on
    * `zValue(xCol, yCol)` — every file covers a disjoint z-span, so
    * its footer min/max on BOTH xCol and yCol are tight boxes and
    * point/range scans on either column skip files. Same cost shape
    * as [[Bucketing.writeRangeSorted]]: one sampled range exchange +
    * streaming per-partition sort; the z column itself never hits
    * disk.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, nFiles: Int): Unit =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
