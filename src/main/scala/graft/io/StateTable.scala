package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned keyed state table: the scale path for sync state that the
  * reference keeps as a full JSONL snapshot per run
  * (`related_items_etl.py:243-271` reads it, `README.md:150` declares
  * the write-back). A snapshot rewrite is O(state) per sync; at 100 TB
  * the right shape is Delta-style merge-on-read:
  *
  *  - [[append]] writes only the CHANGED rows (exactly what
  *    `Ops.deltaCheck` already computes) as a new `v=N` partition —
  *    O(delta) per sync, plus an optional `_deleted` tombstone column;
  *  - [[readLatest]] resolves current state as newest-version-per-key
  *    (one hash shuffle on the key, partition-pruned to live versions);
  *  - [[compact]] folds the version chain back into one snapshot when
  *    the chain gets long — amortized, not per-sync.
  *
  * Versions piggyback on parquet partition discovery (`v=N` dirs), so
  * the reader prunes by version and no manifest file is needed. A real
  * lakehouse adds a transaction log for concurrent writers; single
  * sequential writer (the job scheduler) is assumed here, like the
  * reference's.
  */
object StateTable {

  /** Tombstone marker column: a version row with `_deleted = true`
    * removes its key from [[readLatest]] output.
    */
  val DeletedCol = "_deleted"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Existing version numbers, ascending (empty for a fresh dir). */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .sorted
  }

  /** Append `df` as the next version; returns the version written.
    * Rows must be unique per key within one append (the delta-check
    * output is).
    */
  def append(df: DataFrame, dir: String): Int = {
    val next = versions(df.sparkSession, dir).lastOption.getOrElse(-1) + 1
    df.write.mode("errorifexists").parquet(s"$dir/v=$next")
    next
  }

  /** Current state: the newest version's row per key, tombstones
    * dropped. One shuffle on the key; `mergeSchema` lets later versions
    * add columns (e.g. the tombstone) that earlier ones lack.
    */
  def readLatest(spark: SparkSession, dir: String, keyCols: Seq[String])
      : DataFrame = {
    val all = spark.read.option("mergeSchema", "true").parquet(dir)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("v").desc)
    val latest = all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "v")
    if (latest.columns.contains(DeletedCol))
      latest.where(!coalesce(col(DeletedCol), lit(false))).drop(DeletedCol)
    else latest
  }

  /** Compact when the version chain exceeds `maxVersions` — the
    * amortization policy callers wire after [[append]]: read cost grows
    * with chain length, so bound it; write cost stays O(delta) on every
    * non-compacting sync.
    */
  def maybeCompact(spark: SparkSession, dir: String, keyCols: Seq[String],
      maxVersions: Int): Option[Int] =
    if (versions(spark, dir).size > maxVersions)
      Some(compact(spark, dir, keyCols))
    else None

  /** Fold the version chain into a single snapshot version and drop the
    * older dirs. Not atomic (a transaction log would make it so); safe
    * under the single-sequential-writer assumption.
    */
  def compact(spark: SparkSession, dir: String, keyCols: Seq[String])
      : Int = {
    val old = versions(spark, dir)
    val snapshot = readLatest(spark, dir, keyCols).cache()
    try {
      snapshot.count() // materialize before deleting inputs
      val v = append(snapshot, dir)
      val f = fs(spark, dir)
      old.foreach(n => f.delete(new Path(s"$dir/v=$n"), true))
      v
    } finally snapshot.unpersist()
  }
}
