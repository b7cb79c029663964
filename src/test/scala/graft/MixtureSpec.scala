package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Domain-mixture water-filling (Sampling.mixtureAllocation): the
  * closed-form (r-sort + running sums + boundary lambda*) against an
  * INDEPENDENT brute-force reference — the textbook iterative
  * water-filler (fill proportionally, fix violators at cap, repeat) —
  * over randomized instances, plus the structural edges the closed
  * form must survive (infeasible budget, zero targets, sources with
  * no data, targets with no data, empty input).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  /** Iterative reference: converges in <= n rounds. */
  private def bruteWaterfill(avail: Map[String, Double],
      tw: Map[String, Double], budget: Double,
      maxEpochs: Double): Map[String, Double] = {
    val sources = (avail.keySet ++ tw.keySet).toSeq
    val cap = sources.map(s =>
      s -> avail.getOrElse(s, 0.0) * maxEpochs).toMap
    var fixed = Map.empty[String, Double]
    var pool = sources.filter(s => tw.getOrElse(s, 0.0) > 0).toSet
    sources.filterNot(pool).foreach(s => fixed += s -> 0.0)
    var changed = true
    while (changed && pool.nonEmpty) {
      changed = false
      val remB = budget - fixed.values.sum
      val remT = pool.toSeq.map(tw).sum
      val lam = remB / remT
      val violators = pool.filter(s => lam * tw(s) > cap(s))
      if (violators.nonEmpty) {
        violators.foreach(s => fixed += s -> cap(s))
        pool --= violators
        changed = true
      } else {
        pool.foreach(s => fixed += s -> lam * tw(s))
        pool = Set.empty
      }
    }
    fixed
  }

  private def run(avail: Map[String, Double], tw: Map[String, Double],
      budget: Double, maxEpochs: Double): Map[String, Double] = {
    // one doc per (source, unit): docs carry weights summing to avail
    val docs = avail.toSeq.toDF("src", "w")
    val targets = tw.toSeq.toDF("src", "target_w")
    Sampling.mixtureAllocation(docs, "src", "w", targets,
        budget, maxEpochs)
      .select("src", "alloc_tokens").as[(String, Double)]
      .collect().toMap
  }

  test("matches the iterative water-filler on randomized instances") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(8)
      val avail = (0 until n).map(i =>
        s"s$i" -> (10.0 + rnd.nextInt(1000)).toDouble).toMap
      val tw = (0 until n).map(i =>
        s"s$i" -> (rnd.nextInt(5) + (if (rnd.nextBoolean()) 1 else 0))
          .toDouble).toMap
      val maxE = 1.0 + rnd.nextInt(3)
      val capSum = avail.map { case (s, a) => a * maxE }.sum
      val budget = math.max(1.0, capSum * (0.2 + 0.7 * rnd.nextDouble()))
      if (tw.values.sum > 0) {
        val expect = bruteWaterfill(avail, tw, budget, maxE)
        val got = run(avail, tw, budget, maxE)
        for (s <- expect.keys)
          assert(math.abs(got(s) - expect(s)) < 1e-4,
            s"trial $trial source $s: got ${got(s)} want ${expect(s)} " +
              s"(avail=$avail tw=$tw budget=$budget maxE=$maxE)")
        // the allocation must EXHAUST min(budget, reachable cap mass)
        // — a too-small lambda* would under-allocate and slip past a
        // mere total <= budget check (round-16 review)
        val total = got.values.sum
        val feasible = math.min(budget,
          avail.collect { case (s, a) if tw(s) > 0 => a * maxE }.sum)
        assert(math.abs(total - feasible) < 1e-4,
          s"trial $trial under/over-allocated: $total vs $feasible")
        assert(total <= budget + 1e-4)
      }
    }
  }

  test("infeasible budget caps every source and reports budget_met=false") {
    val docs = Seq(("a", 100.0), ("b", 50.0)).toDF("src", "w")
    val tgts = Seq(("a", 1.0), ("b", 1.0)).toDF("src", "target_w")
    val out = Sampling.mixtureAllocation(docs, "src", "w", tgts,
      budget = 1000.0, maxEpochs = 2.0).orderBy("src").collect()
    assert(out.map(_.getAs[Double]("alloc_tokens")).toSeq ==
      Seq(200.0, 100.0))
    assert(out.forall(!_.getAs[Boolean]("budget_met")))
    assert(out.map(_.getAs[Double]("epochs")).forall(_ == 2.0))
  }

  test("zero-target and data-less sources allocate nothing; their mass redistributes") {
    val docs = Seq(("a", 100.0), ("b", 100.0), ("c", 100.0))
      .toDF("src", "w")
    // c has no target row; d has a target but no data
    val tgts = Seq(("a", 3.0), ("b", 1.0), ("d", 4.0))
      .toDF("src", "target_w")
    val out = Sampling.mixtureAllocation(docs, "src", "w", tgts,
        budget = 100.0, maxEpochs = 5.0)
      .orderBy("src").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("alloc_tokens")).toMap
    assert(out("c") == 0.0, "no-target source got tokens")
    assert(out("d") == 0.0, "data-less source got tokens")
    // d's unfillable weight redistributes: a and b split 100 as 3:1
    assert(math.abs(out("a") - 75.0) < 1e-6 &&
      math.abs(out("b") - 25.0) < 1e-6,
      s"redistribution wrong: $out")
  }

  test("duplicate target rows sum; a negative weight errors at runtime") {
    val docs = Seq(("a", 100.0), ("b", 100.0)).toDF("src", "w")
    val dup = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0))
      .toDF("src", "target_w")
    val out = Sampling.mixtureAllocation(docs, "src", "w", dup,
        budget = 100.0, maxEpochs = 5.0)
      .orderBy("src").collect()
    assert(out.length == 2, "duplicate target rows not collapsed")
    // a:b summed to 2:2 -> equal split
    assert(out.map(_.getAs[Double]("alloc_tokens")).toSeq ==
      Seq(50.0, 50.0))
    val neg = Seq(("a", -1.0), ("b", 2.0)).toDF("src", "target_w")
    val e = intercept[Exception] {
      Sampling.mixtureAllocation(docs, "src", "w", neg,
        budget = 100.0, maxEpochs = 5.0).collect()
    }
    assert(e.getMessage != null)
  }

  test("epochs-budget variant equals the absolute form at budget = e x total") {
    val docs = Seq(("a", 300.0), ("b", 100.0), ("c", 200.0))
      .toDF("src", "w")
    val tgts = Seq(("a", 1.0), ("b", 5.0), ("c", 2.0))
      .toDF("src", "target_w")
    val abs = Sampling.mixtureAllocation(docs, "src", "w", tgts,
      budget = 2.0 * 600.0, maxEpochs = 3.0).orderBy("src").collect()
    val rel = Sampling.mixtureAllocationEpochs(docs, "src", "w", tgts,
      budgetEpochs = 2.0, maxEpochs = 3.0).orderBy("src").collect()
    assert(abs.map(_.toSeq).toSeq == rel.map(_.toSeq).toSeq)
  }

  test("empty corpus yields zero allocations, not an error") {
    val docs = Seq.empty[(String, Double)].toDF("src", "w")
    val tgts = Seq(("a", 1.0)).toDF("src", "target_w")
    val out = Sampling.mixtureAllocation(docs, "src", "w", tgts,
      budget = 10.0, maxEpochs = 2.0).collect()
    assert(out.length == 1 &&
      out.head.getAs[Double]("alloc_tokens") == 0.0)
  }

  test("mixtureSample emits per-epoch copies whose mass tracks the allocation") {
    val rnd = new scala.util.Random(11)
    val docs = (1 to 300).map(i =>
      (i.toLong, s"s${i % 3}", (20 + rnd.nextInt(100)).toDouble))
      .toDF("id", "src", "w")
    val tgts = Seq(("s0", 1.0), ("s1", 2.0), ("s2", 3.0))
      .toDF("src", "target_w")
    val budget = 30000.0
    val alloc = Sampling.mixtureAllocation(docs, "src", "w", tgts,
        budget, maxEpochs = 2.5)
      .select("src", "alloc_tokens", "epochs")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("alloc_tokens"), r.getAs[Double]("epochs")))
      .toMap
    val out = Sampling.mixtureSample(docs, "src", "w", "id", tgts,
      budget, maxEpochs = 2.5)
    // epoch values are dense 1..n per doc
    val perDoc = out.groupBy("src", "id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"))
    assert(perDoc.where(col("n") =!= col("mx")).isEmpty,
      "epoch values not dense 1..n")
    // every doc of one source gets floor(epochs) or floor(epochs)+1
    val k = alloc.map { case (s, (_, e)) => s -> math.floor(e).toLong }
    for ((s, kk) <- k) {
      val ns = perDoc.where(col("src") === s)
        .select("n").as[Long].collect().toSet
      assert(ns.subsetOf(Set(kk, kk + 1)),
        s"source $s copy counts $ns != {$kk, ${kk + 1}}")
    }
    // emitted token mass per source ~ allocation (hash-fraction is
    // approximate: tolerance = the mass one marginal doc can carry)
    val mass = out.join(docs, Seq("src", "id"))
      .groupBy("src").agg(sum("w").as("m"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("m")).toMap
    for ((s, (a, _)) <- alloc if a > 0) {
      val tol = 0.15 * a + 150.0
      assert(math.abs(mass(s) - a) < tol,
        s"source $s emitted ${mass(s)} vs alloc $a")
    }
  }

  test("uncapped allocations are exactly proportional to targets") {
    val docs = Seq(("a", 1000.0), ("b", 1000.0), ("c", 1000.0))
      .toDF("src", "w")
    val tgts = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0))
      .toDF("src", "target_w")
    val out = Sampling.mixtureAllocation(docs, "src", "w", tgts,
        budget = 600.0, maxEpochs = 10.0)
      .orderBy("src").collect()
      .map(_.getAs[Double]("alloc_tokens")).toSeq
    assert(out == Seq(100.0, 200.0, 300.0), s"got $out")
  }

  test("systematicWeighted: hand-replay, exact-k, heavy-row guarantee") {
    import spark.implicits._
    // weights 1,1,8 at k=5 over W=10: copies floor(c*5/10) deltas ->
    // (0, 1, 4); the light first row falls between marks
    val g = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 8L),
      ("b", 9L, 7L)).toDF("g", "id", "w")
    val out = Sampling.systematicWeighted(g, "g", "w", k = 5,
        orderCols = Seq("id"))
      .select("g", "id", "copies").as[(String, Long, Long)]
      .collect().toSet
    assert(out == Set(("a", 2L, 1L), ("a", 3L, 4L), ("b", 9L, 5L)))
  }

  test("prioritySample: hand-replayed keys, weight bias, plan pin") {
    // replicate the engine's md5-60 ':ps' priority in plain JVM code
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:ps".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 1000000L),
      (5L, 10L), (6L, 0L)) // id 6: non-positive weight, excluded
    val df = rows.toDF("id", "w").withColumn("g", lit("all"))
    val out = Sampling.prioritySample(df, "g", "w", "id", k = 3)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    // expected: 3 smallest (h60(id)+1)/w, ties impossible here
    val expect = rows.filter(_._2 > 0)
      .map { case (id, w) => id -> (h60(id) + 1).toDouble / w }
      .sortBy(_._2).take(3).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(out == expect, s"got $out want $expect")
    // the million-weight row's key is ~1e5 smaller: always sampled
    assert(out.contains(4L))
    assert(!out.contains(6L))
    // deterministic under repartitioning + WindowGroupLimit pushdown
    val again = Sampling.prioritySample(df.repartition(5), "g", "w",
      "id", k = 3)
    assert(again.select("id", "rank").as[(Long, Long)]
      .collect().toMap == out)
    val plan = Sampling.prioritySample(df, "g", "w", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "rank pushdown missing")
  }

  test("systematicWeighted: fractional weight column is refused") {
    import spark.implicits._
    // ADVICE r18: a double weight like 0.9 passes the `> 0` filter but
    // truncates to 0 in the decimal(38,0) cast, silently dropping the
    // row AND its mass from W — the integral contract must be enforced
    val frac = Seq(("a", 1L, 0.9), ("a", 2L, 3.0)).toDF("g", "id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.systematicWeighted(frac, "g", "w", k = 2,
        orderCols = Seq("id"))
    }
    assert(e.getMessage.contains("integral"))
    // decimal scale 0 stays accepted (integer-valued by type)
    val dec = Seq(("a", 1L, BigDecimal(2)), ("a", 2L, BigDecimal(3)))
      .toDF("g", "id", "w")
      .withColumn("w", col("w").cast("decimal(38,0)"))
    val tot = Sampling.systematicWeighted(dec, "g", "w", k = 5,
        orderCols = Seq("id"))
      .agg(sum("copies")).as[Long].head()
    assert(tot == 5L)
  }

  test("systematicWeighted: k copies per group, proportional, stable") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.systematicWeighted(d, "lang", "n_chars", k = 50,
        orderCols = Seq("doc_id"))
    val out = run(docs)
    // exactly k copies per group, always
    val totals = out.groupBy("lang").agg(sum("copies").as("s"))
      .as[(String, Long)].collect()
    totals.foreach { case (g, s) => assert(s == 50L, s"$g -> $s") }
    // deterministic under repartitioning
    assert(out.orderBy("lang", "doc_id").collect().toSeq ==
      run(docs.repartition(7)).orderBy("lang", "doc_id")
        .collect().toSeq)
    // expected-copies proportionality: a row's copies are within 1 of
    // w*k/W (systematic sampling's per-row bound)
    val checked = out
      .join(docs.groupBy("lang").agg(sum("n_chars").as("W")), "lang")
      .select(col("copies"),
        (col("n_chars") * 50.0 / col("W")).as("exp"))
      .as[(Long, Double)].collect()
    checked.foreach { case (c, e) =>
      assert(math.abs(c - e) <= 1.0, s"copies $c vs expected $e")
    }
  }
}
