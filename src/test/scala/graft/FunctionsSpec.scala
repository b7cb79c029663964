package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T,
  VectorFunctions => V}

/** Scalar-function specs: text stats, hashing/sketching, vector math.
  * All functions are Catalyst built-ins, so these also guard against
  * Spark 4 ANSI-mode runtime surprises (overflow, strict element_at).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def onText[A](text: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): A =
    Seq(text).toDF("t").select(f(col("t")).as("r")).collect()
      .head.getAs[A]("r")

  // Spark hands array columns back as mutable.ArraySeq — normalize.
  private def onTextSeq(text: String, f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Seq[String] =
    onText[scala.collection.Seq[String]](text, f).toSeq

  test("normalize lowercases, trims and collapses whitespace") {
    assert(onText[String]("  A  b\t C ", T.normalize) == "a b c")
  }

  test("tokens of empty/whitespace text is empty, not ['']") {
    assert(onTextSeq("   ", T.tokens).isEmpty)
    assert(onText[Int]("", T.tokenCount) == 0)
  }

  test("tokenCountBpe counts letter runs, digit runs, single marks") {
    assert(onText[Int]("ab12 cd, x!", T.tokenCountBpe) == 6)
  }

  test("stats guard division by zero on empty text") {
    assert(onText[Double]("", T.punctRatio) == 0.0)
    assert(onText[Double]("", T.meanTokenLength) == 0.0)
    assert(onText[Double]("", T.stopwordRatio) == 0.0)
  }

  test("langId picks the dominant stopword language, und on none") {
    assert(onText[String]("the cat is in the bag", T.langId) == "en")
    assert(onText[String]("der hund ist nicht zu klein", T.langId) == "de")
    assert(onText[String]("zzz qqq", T.langId) == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = onText[String]("Hello  World", T.fingerprint)
    val b = onText[String](" hello world ", T.fingerprint)
    assert(a == b)
  }

  test("rollingFingerprint is order-sensitive and ANSI-overflow-safe") {
    val long = ("tok " * 5000).trim // 5000 tokens: would overflow pre-mod
    val a = onText[Long](long + " a b", T.rollingFingerprint)
    val b = onText[Long](long + " b a", T.rollingFingerprint)
    assert(a != b)
    assert(a >= 0 && a < 2147483647L)
  }

  test("wordShingles: n-grams, whole-text fallback below n tokens") {
    val sh = onTextSeq("a b c d", t => H.wordShingles(T.tokens(t), 3))
    assert(sh == Seq("a b c", "b c d"))
    val short = onTextSeq("a b", t => H.wordShingles(T.tokens(t), 3))
    assert(short == Seq("a b"))
  }

  test("charShingles: sliding char n-grams, whole-text fallback") {
    assert(onTextSeq("abcd", t => H.charShingles(t, 3)) ==
      Seq("abc", "bcd"))
    assert(onTextSeq("ab", t => H.charShingles(t, 3)) == Seq("ab"))
  }

  test("jaccard: distinct-set semantics, 0 on disjoint and on empty") {
    def j(a: Seq[String], b: Seq[String]): Double =
      Seq((a, b)).toDF("a", "b")
        .select(H.jaccard(col("a"), col("b")).as("r"))
        .collect().head.getDouble(0)
    // {x,y} vs {y,z}: |∩|=1, |∪|=3 (duplicates collapse first)
    assert(j(Seq("x", "y", "x"), Seq("y", "z")) == 0.333333)
    assert(j(Seq("x"), Seq("y")) == 0.0)
    assert(j(Nil, Nil) == 0.0)
  }

  test("minhash signature: equal sets agree; bands are complete for them") {
    val df = Seq(("d1", Seq("s1", "s2", "s3")), ("d2", Seq("s3", "s2", "s1")))
      .toDF("id", "sh")
      .select(col("id"),
        H.bandKeys(H.minhashSignature(col("sh"), 16), 4, 4).as("bands"))
    val rows = df.collect().map(_.getSeq[Long](1))
    assert(rows(0) == rows(1)) // order-insensitive, all 4 bands collide
  }

  test("simhash: identical token arrays at distance 0, disjoint far") {
    val df = Seq(("a", "the quick brown fox"), ("b", "the quick brown fox"),
      ("c", "zzz qqq www uuu"))
      .toDF("id", "t").select(col("id"),
        H.simhash60(T.tokens(col("t"))).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("b")) == 0)
    assert(ham(m("a"), m("c")) > 10)
  }

  test("cosine: parallel 1, orthogonal 0, zero-vector guarded") {
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      Seq((a, b)).toDF("a", "b")
        .select(round(V.cosine(col("a"), col("b")), 6).as("r"))
        .collect().head.getDouble(0)
    assert(cos(Seq(1, 2, 3), Seq(2, 4, 6)) == 1.0)
    assert(cos(Seq(1, 0), Seq(0, 1)) == 0.0)
    assert(cos(Seq(0, 0), Seq(1, 1)) == 0.0)
  }

  test("sign-LSH band keys: identical vectors share all bands") {
    val planes = V.hyperplanes(4, 8)
    val df = Seq((Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("a", "b")
      .select(V.signLshBandKeys(col("a"), planes, 4).as("ka"),
        V.signLshBandKeys(col("b"), planes, 4).as("kb"))
    val r = df.collect().head
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getSeq[Long](0).distinct.size == 4) // band tags disambiguate
  }

  test("hash split: deterministic, exhaustive, and sample-consistent") {
    import graft.operators.Sampling
    val ids = (1L to 2000L).toDF("id")
    val out = ids.select(col("id"),
        Sampling.assignSplit(col("id"), Seq("train" -> 800000L,
          "val" -> 100000L, "test" -> 100000L)).as("split"),
        Sampling.hashSample(col("id"), 100000L).as("in10pct"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val byName = out.groupBy(_._2).view.mapValues(_.length).toMap
    // uniform hash: fractions land near the 80/10/10 weights
    assert(byName("train") > 1500 && byName("val") > 120 &&
      byName("test") > 120)
    assert(byName.values.sum == 2000) // every row gets exactly one split
    // ~10% sampled, and a second evaluation returns the identical set
    val n10 = out.count(_._3)
    assert(n10 > 120 && n10 < 280)
    val again = ids.select(col("id"),
        Sampling.hashSample(col("id"), 100000L).as("s"))
      .where(col("s")).select("id").as[Long].collect().toSet
    assert(again == out.filter(_._3).map(_._1).toSet)
  }

  test("PII signal counts: non-overlapping matches, clean text zero") {
    import graft.functions.{TextFunctions => T}
    val rows = Seq(
      ("a@b.co and c.d@e-f.org", "no pii here at all", "1234567"),
      ("not-an-email @ nope", "http://x.y/z https://q.r", "123456 12345678901")
    ).toDF("t1", "t2", "t3")
      .select(T.emailCount(col("t1")).as("e"),
        T.urlCount(col("t2")).as("u"),
        T.longNumberCount(col("t3")).as("n"))
      .as[(Long, Long, Long)].collect().toSeq
    // row 1: two emails; zero urls in plain text; one 7-digit run
    // row 2: "@ nope" is not an email; two urls; only the 11-digit run
    // (6 digits misses the 7+ floor) counted ONCE (non-overlapping)
    assert(rows == Seq((2L, 0L, 1L), (0L, 2L, 1L)))
  }

  test("hyperplanes are deterministic and md5-derived") {
    assert(V.hyperplanes(8, 4) == V.hyperplanes(8, 4))
    val p = V.hyperplanes(2, 1)
    assert(p.head.forall(c => c >= -1.0 && c < 1.0))
    // component (0,0) reproduces the cross-engine md5 formula
    val h = graft.expressions.Kernels.md5_60("plane_0_0".getBytes("UTF-8"))
    assert(p.head.head == h.toDouble / 1152921504606846976.0 * 2 - 1)
  }
}
