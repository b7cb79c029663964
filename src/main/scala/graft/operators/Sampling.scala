package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * reproducibility primitive of a training-data pipeline. `rand()`-based
  * sampling changes on every run, partitioning, and Spark version;
  * hashing a stable key means the same row lands in the same split on
  * every engine, forever, and membership is checkable in plain SQL
  * (`('0x'||substr(md5(k),1,15))::BIGINT % 1000000`). Pure built-ins
  * (md5/conv), fully codegen'd, no shuffle — split assignment is a
  * per-row projection.
  */
object Sampling {

  final val Buckets = 1000000L

  /** Uniform bucket in [0, 1000000) from the md5 of the key's string
    * form. Same derivation as [[graft.expressions.Kernels.md5_60]]
    * (first 15 hex chars), so any md5-equipped engine reproduces it.
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % Buckets

  /** Split label by cumulative weight over the hash bucket. Weights are
    * parts-per-million boundaries, e.g.
    * `Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L)`.
    */
  def assignSplit(key: Column, weights: Seq[(String, Long)]): Column = {
    require(weights.map(_._2).sum == Buckets,
      s"weights must sum to $Buckets ppm")
    val b = hashBucket(key)
    val (expr, _) = weights.init.foldLeft(
      (None: Option[Column], 0L)) { case ((acc, cum), (name, w)) =>
      val upper = cum + w
      val branch = acc match {
        case None    => when(b < upper, lit(name))
        case Some(c) => c.when(b < upper, lit(name))
      }
      (Some(branch), upper)
    }
    expr.map(_.otherwise(lit(weights.last._1)))
      .getOrElse(lit(weights.last._1))
  }

  /** Deterministic fractional sample: keep rows whose bucket falls
    * below `ppm` parts-per-million of the key space.
    */
  def hashSample(key: Column, ppm: Long): Column = hashBucket(key) < ppm

  /** Leakage-safe dataset split: assignment hashes the dedup-GROUP
    * root, not the row id, so near-duplicate documents can never
    * straddle train/test (the classic eval-contamination bug a plain
    * per-row split commits whenever the corpus still contains near-dup
    * twins). `groups` is [[Dedup.dedupGroups]]' (id, comp) output —
    * rows absent from it (no near-dup edge) key by their own id. One
    * equi-join (AQE picks broadcast when the grouped subset is small),
    * then the same codegen'd per-row hash projection as
    * [[assignSplit]].
    */
  def groupAwareSplit(df: org.apache.spark.sql.DataFrame, idCol: String,
      groups: org.apache.spark.sql.DataFrame,
      weights: Seq[(String, Long)]): org.apache.spark.sql.DataFrame =
    df.join(groups.select(col("id").as(idCol), col("comp")),
        Seq(idCol), "left_outer")
      .withColumn("split",
        assignSplit(coalesce(col("comp"), col(idCol)), weights))
      .drop("comp")
}
