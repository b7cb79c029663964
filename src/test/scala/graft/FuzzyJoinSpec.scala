package graft

import graft.operators.FuzzyJoin

/** Fuzzy-join blocking must be COMPLETE: the prefix filter and the
  * short-string fallback together may never lose a qualifying pair.
  * Graded against a driver-side brute-force Levenshtein that shares no
  * code with the operator.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("edJoin equals brute force on random keys, short strings included") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    def randStr() = Seq.fill(1 + rnd.nextInt(8))(
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val lefts = (1L to 40L).map(i => (i, randStr()))
    val rights = (1L to 40L).map(i => (i + 1000L, randStr()))
    val out = FuzzyJoin.edJoin(lefts.toDF("id", "k"), "id", "k",
        rights.toDF("id", "k"), "id", "k", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (li, lk) <- lefts
      (ri, rk) <- rights
      d = lev(lk, rk) if d <= 2
    } yield (li, ri, d.toLong)).toSet
    // completeness AND precision: exactly the brute-force pair set
    assert(out == brute,
      s"missing=${(brute -- out).take(5)} spurious=${(out -- brute).take(5)}")
  }

  test("edJoin: null keys and empty sides produce empty results, not errors") {
    val l = Seq((1L, null.asInstanceOf[String]), (2L, "ok"))
      .toDF("id", "k")
    val empty = spark.emptyDataFrame
      .selectExpr("CAST(1 AS BIGINT) AS id", "'x' AS k").where("1=0")
    assert(FuzzyJoin.edJoin(l, "id", "k", empty, "id", "k", 2).count() == 0)
    assert(FuzzyJoin.edJoin(empty, "id", "k", l, "id", "k", 2).count() == 0)
    // null-keyed rows are dropped, the rest still link
    val r = Seq((9L, "ok")).toDF("id", "k")
    val out = FuzzyJoin.edJoin(l, "id", "k", r, "id", "k", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.toSeq == Seq((2L, 9L)))
  }

  test("edJoin at maxDist 0 degrades to exact equality linkage") {
    val l = Seq((1L, "same key"), (2L, "only left")).toDF("id", "k")
    val r = Seq((10L, "same key"), (20L, "only right")).toDF("id", "k")
    val out = FuzzyJoin.edJoin(l, "id", "k", r, "id", "k", maxDist = 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L, 0L)))
  }

  test("jaroWinkler matches the canonical values and edge conventions") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{TextFunctions => T}
    // expected values are DuckDB's jaro_winkler_similarity outputs
    // (the oracle engine) for the classic literature pairs
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "x", 0.0),
      ("", "", 0.0) // DuckDB convention: either side empty -> 0
    )
    val out = cases.toDF("a", "b", "want")
      .select(T.jaroWinkler(col("a"), col("b")).as("got"), col("want"))
      .as[(Double, Double)].collect()
    for ((got, want) <- out)
      assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    // null propagates, symmetric on a random stripe
    val nulls = Seq((null.asInstanceOf[String], "x"))
      .toDF("a", "b")
      .select(T.jaroWinkler(col("a"), col("b"))).collect()
    assert(nulls.head.isNullAt(0))
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((
      rnd.alphanumeric.take(rnd.nextInt(10)).mkString,
      rnd.alphanumeric.take(rnd.nextInt(10)).mkString))
    val sym = pairs.toDF("a", "b").select(
        T.jaroWinkler(col("a"), col("b")).as("ab"),
        T.jaroWinkler(col("b"), col("a")).as("ba"))
      .as[(Double, Double)].collect()
    assert(sym.forall { case (ab, ba) => ab == ba })
  }

  test("jwLinkage keeps ED-blocked pairs at or above the rounded threshold") {
    val catalog = Seq((1L, "martha stone"), (2L, "zzzz"))
      .toDF("id", "k")
    val dirty = Seq((10L, "marhta stone"), (11L, "totally other"))
      .toDF("id", "k")
    val out = FuzzyJoin.jwLinkage(dirty, "id", "k", catalog, "id", "k",
        maxDist = 2, minJw = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, 1L)))
    // a sky-high threshold empties the result, never errors
    assert(FuzzyJoin.jwLinkage(dirty, "id", "k", catalog, "id", "k",
      maxDist = 2, minJw = 0.9999).count() == 0)
  }
}
