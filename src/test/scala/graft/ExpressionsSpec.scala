package graft

import org.apache.spark.sql.functions._

import graft.expressions.NativeExpressions

/** Native-expression semantics: differentials against the equivalent
  * built-in (higher-order-function) formulations, and codegen-vs-
  * interpreted agreement so `eval` and `doGenCode` can never drift.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", "", "single", "x y z x y z x y z")

  test("wordShingles matches the HOF formulation on all edge shapes") {
    val hof = (tokens: org.apache.spark.sql.Column, n: Int) =>
      when(size(tokens) < n, array(concat_ws(" ", tokens)))
        .otherwise(transform(sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
    val df = texts.toDF("t")
      .select(split(col("t"), " ").as("tok"))
      .select(
        NativeExpressions.wordShingles(col("tok"), 3).as("native"),
        hof(col("tok"), 3).as("ref"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("cosine matches the zip_with/aggregate formulation bit-for-bit") {
    val dot = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x)
    val rnd = new scala.util.Random(1)
    val vecs = Seq.fill(20)((Seq.fill(16)(rnd.nextGaussian()),
      Seq.fill(16)(rnd.nextGaussian())))
    val df = vecs.toDF("a", "b").select(
      NativeExpressions.cosine(col("a"), col("b")).as("native"),
      (dot(col("a"), col("b")) /
        (sqrt(dot(col("a"), col("a"))) * sqrt(dot(col("b"), col("b")))))
        .as("ref"))
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("jaccard matches the array_intersect formulation") {
    val ref = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) => {
      val inter = size(array_intersect(array_distinct(a), array_distinct(b)))
      val union = size(array_distinct(a)) + size(array_distinct(b)) - inter
      round(when(union === 0, lit(0.0))
        .otherwise(inter.cast("double") / union.cast("double")), 6)
    }
    val pairs = Seq(
      (Seq("a", "b", "a"), Seq("b", "c")),
      (Seq("a"), Seq("a")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("x", "y"), Seq("p", "q")))
    val df = pairs.toDF("a", "b").select(
      NativeExpressions.jaccard(col("a"), col("b")).as("native"),
      ref(col("a"), col("b")).as("ref"))
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("winnowedFingerprints matches an independent selection replay") {
    // independent md5_60 + sliding-min reimplementation, no Kernels code
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def expected(text: String, n: Int, w: Int): Seq[Long] = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val sh = if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val hs = sh.map(md5_60)
      val effW = math.min(w, hs.length)
      (0 to hs.length - effW).map(p => hs.slice(p, p + effW).min)
        .distinct.sorted
    }
    val texts = Seq(
      "a b c d e f g h i j k l m n o p",
      "a b c",            // fewer shingles than the window
      "x",                // fewer tokens than n
      "r r r r r r r r")  // all-equal hashes collapse to one
    val out = texts.toDF("t")
      .select(NativeExpressions.winnowedFingerprints(
        split(col("t"), " "), 4, 4).as("fp"))
      .collect().map(_.getSeq[Long](0))
    texts.zip(out).foreach { case (t, got) =>
      assert(got == expected(t, 4, 4), s"mismatch for '$t'")
    }
  }

  test("bloomMightContain: every inserted key probes true, fresh keys false") {
    val members = (1 to 200).map(i => s"member_$i")
    val bf = members.toDF("k").stat.bloomFilter("k", 1000L, 0.001)
    val probes = (members ++ (1 to 200).map(i => s"fresh_$i")).toDF("k")
      .select(col("k"),
        NativeExpressions.bloomMightContain(col("k"), bf).as("hit"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    // no false negatives, ever — this is the property dedupAgainstBloom
    // leans on for correctness
    probes.filter(_._1.startsWith("member")).foreach(p =>
      assert(p._2, s"false negative on ${p._1}"))
    // at 0.1% fpp over 200 fresh probes, any false positive for THIS
    // fixed filter+probe set is deterministic; observed: zero
    assert(probes.filter(_._1.startsWith("fresh")).count(_._2) == 0)
  }

  test("minhash signature: permutation- and duplicate-invariant") {
    val df = Seq(
      (Seq("s1", "s2", "s3"), Seq("s3", "s1", "s2", "s1")),
      (Seq("x"), Seq("x", "x"))).toDF("a", "b").select(
      NativeExpressions.minhashSignature(col("a"), 16).as("sa"),
      NativeExpressions.minhashSignature(col("b"), 16).as("sb"))
    df.collect().foreach(r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("SQL registration: native expressions usable from spark.sql") {
    graft.expressions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  word_shingles(array('a','b','c'), 2) AS sh,
        |  winnow_fingerprints(array('a','b','c','d','e'), 2, 2) =
        |    winnow_fingerprints(array('a','b','c','d','e'), 2, 2) AS wEq,
        |  simhash60(array('x','y')) = simhash60(array('x','y')) AS simEq,
        |  jaccard_sim(array('a','b'), array('b','c')) AS j,
        |  round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS c,
        |  size(minhash_band_keys(
        |    minhash_signature(array('s1','s2'), 16), 4, 4)) AS nb
        |""".stripMargin).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getBoolean(1)) // winnow_fingerprints deterministic
    assert(r.getBoolean(2))
    assert(r.getDouble(3) == 0.333333)
    assert(r.getDouble(4) == 1.0)
    assert(r.getInt(5) == 4)
  }

  test("SQL registration: quantized cosine and bounded top-k aggregate") {
    graft.expressions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  quantize_i8(array(1.0d, -0.5d, 0.0d)) AS codes,
        |  round(cosine_i8(quantize_i8(array(1.0d, 0.0d)),
        |                  quantize_i8(array(2.0d, 0.0d))), 6) AS ci
        |""".stripMargin).collect().head
    // -0.5/(1/127) = -63.5; floor(x + 0.5) is HALF-UP toward +inf -> -63
    assert(r.getSeq[Byte](0) == Seq[Byte](127, -63, 0))
    assert(r.getDouble(1) == 1.0) // scale-invariance: parallel -> 1
    val agg = spark.sql(
      """SELECT k, bounded_top_k(named_struct('v', v), 2) AS top
        |FROM VALUES ('a', 3), ('a', 1), ('a', 7), ('b', 5) AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin)
      .selectExpr("k", "transform(top, x -> x.v) AS vs")
      .collect().map(x => (x.getString(0), x.getSeq[Int](1))).toSeq
    assert(agg == Seq(("a", Seq(7, 3)), ("b", Seq(5))))
    // misra_gries with capacity >= distinct count degrades to exact
    val mg = spark.sql(
      """SELECT misra_gries(x, 10) AS sk
        |FROM VALUES ('a'), ('a'), ('b'), ('a') AS t(x)""".stripMargin)
      .selectExpr("transform(sk, e -> concat(e.item, ':', e.cnt)) AS s")
      .collect().head.getSeq[String](0)
    assert(mg == Seq("a:3", "b:1"))
  }

  test("bpeSegment: greedy min-rank leftmost merges, reference-exact") {
    import graft.functions.{TextFunctions => T}
    // independent Scala reference of the contract
    def ref(text: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      val words = text.trim.toLowerCase.replaceAll("\\s+", " ")
        .split(" ").filter(_.nonEmpty)
      words.toSeq.flatMap { w =>
        var s = w.codePoints().toArray.toSeq
          .map(cp => new String(Character.toChars(cp)))
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
    }
    val merges = T.demoMerges
    val cases = Seq(
      "The thin another thing is interesting and the rest",
      "standing on the corner with an orange",
      "a", "", "   ", "THE the ThE",
      "tttthhhh atat atatat",        // overlapping candidate runs
      "xyz qqq",                     // no merge applies
      "intéressant naïve") // non-ASCII code points
    cases.foreach { txt =>
      val got = Seq(Tuple1(txt)).toDF("t")
        .select(T.bpeSegment(col("t"), merges).as("s"))
        .as[Seq[String]].head()
      assert(got == ref(txt, merges), s"text=`$txt` got=$got")
    }
    // a merge can CREATE the pair of an earlier rule: rank0 (b,c),
    // rank1 (a,bc) — after (b,c) fires, (a,bc) must fire too, and the
    // min-rank loop must pick (b,c) before the also-present (c,b)=r2
    val chain = Seq(("b", "c"), ("a", "bc"), ("c", "b"))
    val got2 = Seq(Tuple1("abcb")).toDF("t")
      .select(T.bpeSegment(col("t"), chain).as("s"))
      .as[Seq[String]].head()
    assert(got2 == Seq("abc", "b"), s"got $got2")
    // leftmost tie: rank0 (a,a) on "aaaa" -> aa,aa not a,aa,a
    val got3 = Seq(Tuple1("aaaa")).toDF("t")
      .select(T.bpeSegment(col("t"), Seq(("a", "a"))).as("s"))
      .as[Seq[String]].head()
    assert(got3 == Seq("aa", "aa"), s"got $got3")
    // count wrapper
    val cnt = Seq(Tuple1("the the")).toDF("t")
      .select(T.bpeTokenCount(col("t"), merges).as("n"))
      .as[Int].head()
    assert(cnt == 2, s"got $cnt")
  }

  test("interpreted eval agrees with codegen for every expression") {
    val planes = graft.functions.VectorFunctions.hyperplanes(8, 8)
    def results(): Seq[org.apache.spark.sql.Row] = {
      val docs = texts.toDF("t")
        .select(split(col("t"), " ").as("tok"),
          array(col("t"), lit("fixed")).as("pair"))
      val vec = Seq((Seq.fill(8)(0.5), Seq.fill(8)(-0.25))).toDF("a", "b")
      docs.select(
        NativeExpressions.wordShingles(col("tok"), 2).as("sh"),
        NativeExpressions.minhashSignature(col("tok"), 8).as("sig"),
        NativeExpressions.simhash60(col("tok")).as("sim"),
        NativeExpressions.jaccard(col("tok"), col("pair")).as("j"),
        NativeExpressions.bpeSegment(col("tok"),
          graft.functions.TextFunctions.demoMerges).as("bpe"))
        .collect().toSeq ++
        vec.select(
          NativeExpressions.cosine(col("a"), col("b")).as("c"),
          NativeExpressions.signLshBandKeys(col("a"), planes, 4).as("k"),
          NativeExpressions.quantizeI8(col("a")).as("q"),
          NativeExpressions.cosineI8(NativeExpressions.quantizeI8(col("a")),
            NativeExpressions.quantizeI8(col("b"))).as("ci"))
          .collect().toSeq
    }
    val codegen = results()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = results()
      assert(codegen.map(_.toString) == interpreted.map(_.toString))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}
