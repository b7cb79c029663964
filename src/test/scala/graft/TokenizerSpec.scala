package graft

import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** BPE training contract: reference-exact learn loop, determinism
  * under partitioning, early exhaustion, and train/apply consistency
  * (the learned table re-derives the training segmentation).
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference of the documented contract. */
  private def ref(wordCounts: Map[String, Long],
      k: Int): Seq[(Int, String, String, Long)] = {
    def apply(w: String, table: Seq[(String, String)]): Seq[String] = {
      val rank = table.zipWithIndex
        .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).min }
      var s: Seq[String] = w.map(_.toString)
      var go = true
      while (go && s.length > 1) {
        val cands = s.indices.dropRight(1).flatMap(i =>
          rank.get((s(i), s(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          s = s.take(i) ++ Seq(s(i) + s(i + 1)) ++ s.drop(i + 2)
        }
      }
      s
    }
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var go = true
    while (learned.size < k && go) {
      val table = learned.toSeq.map(t => (t._2, t._3))
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      wordCounts.foreach { case (w, c) =>
        val s = apply(w, table)
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) += c
        }
      }
      if (counts.isEmpty) go = false
      else {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        learned += ((learned.size, l, r, n))
      }
    }
    learned.toSeq
  }

  test("bpeTrain: reference-exact on the classic Sennrich corpus") {
    // low x5, lower x2, newest x6, widest x3 — the ACL'16 example
    // shape; composite merges (es->est, l+o->lo...) must appear
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).map(Tuple1(_)).toDF("text")
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val want = ref(wc, 8)
    val got = Tokenizer.bpeTrain(docs, "text", merges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"\ngot  $got\nwant $want")
    // at least one learned rule must merge a COMPOSITE symbol (the
    // interesting BPE behavior, not just char bigrams)
    assert(got.exists(t => t._2.length > 1 || t._3.length > 1),
      s"no composite merge learned: $got")
    // determinism under partitioning: pair counting and argmax are
    // order-free
    val got13 = Tokenizer.bpeTrain(docs.repartition(13), "text",
        merges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got13 == got)
  }

  test("bpeTrain: exhaustion stops early; multi-word docs tokenize") {
    val docs = Seq.fill(3)(Tuple1("ab ab")).toDF("text")
    // "ab" x6 -> rule (a,b) fully merges every word; no pair remains
    val got = Tokenizer.bpeTrain(docs, "text", merges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((0, "a", "b", 6L)), s"got $got")
  }
}
