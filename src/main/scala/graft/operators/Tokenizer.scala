package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.expressions.NativeExpressions
import graft.functions.{TextFunctions => T}

/** Distributed tokenizer TRAINING — the other half of the BPE story
  * ([[graft.functions.TextFunctions.bpeSegment]] applies a table;
  * this learns one): the public byte-pair-encoding learner (Sennrich
  * et al. ACL'16) over a Spark corpus.
  *
  * The classic reduction makes this tractable at 100 TB: BPE
  * statistics depend only on the corpus's DISTINCT-WORD frequency
  * table, so the corpus collapses ONCE to (word, count) — vocabulary
  * scale, not corpus scale; Zipf caps real-text vocabularies around
  * millions of rows however many petabytes feed them — and every
  * training iteration is one map-side-combinable aggregation over
  * that table plus a single-row argmax collect (bounded driver
  * traffic by construction).
  *
  * Iteration contract, stated exactly (the oracle replays it): at
  * step i the corpus words are segmented by GREEDY MIN-RANK APPLY of
  * the first i learned rules from code points (the [[graft
  * .expressions.Kernels.bpeSegment]] semantics — re-derived from
  * scratch each step, so step state and final apply semantics can
  * never drift apart); every adjacent symbol pair occurrence counts
  * word-frequency-weighted (overlapping occurrences included, the
  * Sennrich convention); rule i+1 is the maximal-count pair with
  * ties broken by (left, right) ascending — a total order, so the
  * learned table is deterministic on any cluster. Training stops
  * early when no adjacent pair remains (every word fully merged).
  */
object Tokenizer {

  /** Learn `merges` BPE rules from the corpus.
    *
    * @return (rank, left, right, n_pairs) — one row per learned rule
    *   in learn order; `n_pairs` is the weighted occurrence count the
    *   rule won with
    */
  def bpeTrain(docs: DataFrame, textCol: String,
      merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the one corpus-scale pass: distinct words + frequencies, pinned
    // because every iteration re-reads it
    val words = docs
      .select(explode(T.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      words.count()
      val learned =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var exhausted = false
      while (learned.size < merges && !exhausted) {
        val table = learned.toSeq.map(t => (t._1, t._2))
        val syms = NativeExpressions.bpeSegment(array(col("w")), table)
        val best = words
          .select(col("cnt"), syms.as("s"))
          .where(size(col("s")) >= 2)
          .select(col("cnt"), explode(transform(
            sequence(lit(1), size(col("s")) - 1),
            i => struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1)
          .collect() // exactly one row — bounded by construction
        if (best.isEmpty) exhausted = true
        else learned += ((best(0).getAs[String]("l"),
          best(0).getAs[String]("r"), best(0).getAs[Long]("n")))
      }
      learned.toSeq.zipWithIndex
        .map { case ((l, r, n), k) => (k, l, r, n) }
        .toDF("rank", "left", "right", "n_pairs")
    } finally words.unpersist(blocking = false)
  }
}
