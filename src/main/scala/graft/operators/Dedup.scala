package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Deduplication operators for training-data pipelines, designed around
  * one invariant: NO all-pairs comparison ever happens. Every
  * approximate method is candidate-generation-by-bucketing (shuffle on a
  * short key) followed by exact verification within buckets — the only
  * shape that survives 100 TB. Skew guard: buckets larger than
  * `maxBucket` are dropped (a bucket that big means a degenerate key,
  * e.g. empty text, not a real near-dup cluster).
  */
object Dedup {

  /** Exact dedup by content fingerprint (hash-groupBy). Returns
    * (idCol, fingerprint, keeper) where keeper is the minimum id sharing
    * the fingerprint — rows with `idCol != keeper` are the duplicates.
    * One shuffle on a 128-bit key; map-side partial agg applies.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol), T.fingerprint(col(textCol)).as("fp"))
    val keepers = fp.groupBy("fp").agg(min(idCol).as("keeper"))
    fp.join(keepers, "fp")
  }

  /** MinHash+LSH near-dup candidate pairs, exact-Jaccard verified.
    *
    * shingle -> minhash signature -> band keys -> explode bands ->
    * self-join per bucket (id_a < id_b) -> distinct pair -> verify
    * Jaccard(shingles_a, shingles_b) >= threshold.
    *
    * The band join shuffles only (bandKey, id, shingles); signature
    * params (numHashes=32, bands=8 -> r=4) put the S-curve knee near
    * j~0.5. Verification re-joins shingle arrays for candidate ids only.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val rpb = numHashes / bands
    val shingled = df.select(
      col(idCol).as("id"),
      array_distinct(H.wordShingles(T.tokens(col(textCol)), shingleWidth))
        .as("shingles"))
    val banded = shingled
      .withColumn("band",
        explode(H.bandKeys(H.minhashSignature(col("shingles"), numHashes),
          bands, rpb)))
    // Skew guard: degenerate buckets out.
    val counts = banded.groupBy("band").count()
      .where(col("count") <= maxBucket && col("count") > 1)
    val inBuckets = banded.join(counts, "band")
      .select(col("band"), col("id"), col("shingles"))
    val pairs = inBuckets.alias("a")
      .join(inBuckets.alias("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard", H.jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs within a Hamming radius. Candidate
    * generation by the pigeonhole banding of [[H.simhashBandKeys]]
    * (complete for radius <= pieces-1), verified by exact Hamming
    * distance. Shuffles only (chunkKey, id, simhash).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val pieces = maxHamming + 1
    val sims = df.select(col(idCol).as("id"),
      H.simhash64(T.tokens(col(textCol))).as("sim"))
    val banded = sims.withColumn("k",
      explode(H.simhashBandKeys(col("sim"), pieces)))
    val counts = banded.groupBy("k").count()
      .where(col("count") <= maxBucket && col("count") > 1)
    val inBuckets = banded.join(counts, "k")
      .select(col("k"), col("id"), col("sim"))
    inBuckets.alias("a")
      .join(inBuckets.alias("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        H.hamming64(col("a.sim"), col("b.sim")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard similarity for an EXPLICIT candidate pair set
    * (pairs discovered by any bucketing scheme, or small curated sets).
    * Exposed separately so the exact metric is reusable and oracle-
    * checkable without the LSH layer.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"),
      array_distinct(H.wordShingles(T.tokens(col(textCol)), n)).as("__sh"))
    pairs
      .join(sh.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        H.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }
}
