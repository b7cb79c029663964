package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 semantics on a corpus where the ranking is known by hand. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: tf raises, length normalizes, absent terms score nothing") {
    val docs = Seq(
      (1L, "fox fox den"),                          // tf=2, short
      (2L, "fox and a very long tale about nothing at all here"), // tf=1
      (3L, "no relevant words whatsoever")
    ).toDF("doc_id", "text")
    val q = Seq("fox").toDF("term")
    val out = Retrieval.bm25(docs, q, "doc_id", "text")
      .orderBy(col("score").desc)
      .as[(Long, Double)].collect()
    // doc 3 shares no term -> absent entirely
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 > 0.0))
    // higher tf in a shorter doc must dominate
    assert(out(0)._2 > out(1)._2)
  }

  test("bm25: rarer term outweighs common term at equal tf") {
    val docs = Seq(
      (1L, "common rare"),
      (2L, "common filler"),
      (3L, "common stuff"),
      (4L, "common words")
    ).toDF("doc_id", "text")
    val q = Seq("common", "rare").toDF("term")
    val out = Retrieval.bm25(docs, q, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // doc 1 matches both terms; the rare term's idf must push it above
    // any common-only doc by more than the common term's own score
    assert(out(1L) > out(2L) * 2)
  }
}
