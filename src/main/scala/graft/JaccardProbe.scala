package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale probe for the exact Jaccard-threshold self-join (VERDICT r15
  * #2): the prefix self-join's CANDIDATE-PAIR count is the quantity
  * that can explode with corpus scale and shingle distribution — wall
  * time alone can't show whether the rarest-first prefix is holding it
  * ~linear. This main runs the join over a documents table and prints
  * one JSON line with the doc count, the candidate count, the
  * surviving pair count, and the join's wall seconds, so ratios across
  * sf0.1 / x10 / x100 fixtures separate "candidates grew linearly" from
  * "the verify stage got faster/slower".
  *
  * Usage: runMain graft.JaccardProbe [dir] [threshold] [shingleWidth]
  *   dir defaults to /root/testdata/sf0.1; threshold to 0.5 (the
  *   q_jaccard_join setting); width to 3.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val width = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkBoot.session(SparkBoot.cpus())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs.count()
    val cache = Some(StorageLevel.MEMORY_AND_DISK)
    // candidate count: same stage the join consumes, counted once on
    // its own so the number is attributable (the cached explode frame
    // is shared, as in the join)
    val t0 = System.nanoTime()
    val nCands = graft.operators.Dedup.jaccardCandidates(
      docs, "doc_id", "text", threshold, width, cache).count()
    val tCand = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    // full join, end to end, fresh cache (as the bench runs it)
    val t1 = System.nanoTime()
    val nPairs = graft.operators.Dedup.jaccardJoin(
      docs, "doc_id", "text", threshold, width, cache).count()
    val tJoin = (System.nanoTime() - t1) / 1e9
    println(s"""{"dir":"$dir","threshold":$threshold,""" +
      s""""shingle_width":$width,"n_docs":$nDocs,""" +
      s""""n_candidates":$nCands,"n_pairs":$nPairs,""" +
      s""""candidates_per_doc":${nCands.toDouble / nDocs},""" +
      s""""sec_candidates":$tCand,"sec_join":$tJoin}""")
    spark.stop()
  }
}
