package graft

import graft.operators.Events

/** Hand-checkable fixtures for the Markov transition matrix and the
  * Kaplan-Meier estimator.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix: ordered steps, row-normalized probabilities") {
    // user 1: a,b,a -> a->b, b->a; user 2: a,a -> a->a
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "a"), (3L, 1L, "z") /* no successor */)
      .toDF("u", "seq", "state")
    val out = Events.transitionMatrix(ev, "u", Seq("seq"), "state")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("a", "a") -> ((1L, 0.5)), ("a", "b") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("transitionMatrix: order columns, not arrival order, define steps") {
    val ev = Seq((1L, 3L, "c"), (1L, 1L, "a"), (1L, 2L, "b"))
      .toDF("u", "seq", "state")
    val out = Events.transitionMatrix(ev, "u", Seq("seq"), "state")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }

  test("kaplanMeier: risk sets, censoring, exact-zero tail") {
    // A: 1 obs; B: 2 cens; C: 2 obs; D: 3 obs
    val d = Seq((1L, true), (2L, false), (2L, true), (3L, true))
      .toDF("dur", "obs")
    val out = Events.kaplanMeier(d, "dur", "obs").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val m = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(m(1L) == ((4L, 1L, 0L, 0.75)))       // 1 - 1/4
    assert(m(2L) == ((3L, 1L, 1L, 0.5)))        // 0.75 * (1 - 1/3)
    assert(m(3L) == ((1L, 1L, 0L, 0.0)))        // d = n_risk -> exact 0
  }

  test("kaplanMeier: all-censored curve stays at 1") {
    val d = Seq((5L, false), (7L, false)).toDF("dur", "obs")
    val out = Events.kaplanMeier(d, "dur", "obs").collect()
    assert(out.forall(_.getDouble(4) == 1.0))
    // risk set still shrinks
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L))
  }

  test("transitionMatrixBucketed == transitionMatrix: boundaries, " +
      "empty buckets, randomized") {
    // deterministic pseudo-random log: 200 events, 5 users, 4 states,
    // timestamps spread so bucket width 10 leaves many empty buckets
    // between occupied ones, and several bucket-boundary transitions
    val rows = (0 until 200).map { i =>
      val u = (i * 7919) % 5
      val ts = ((i * 104729) % 1000).toLong
      val st = "s" + ((i * 31 + u) % 4)
      (u.toLong, ts, i.toLong, st)
    }
    import spark.implicits._
    val df = rows.toDF("u", "ts", "id", "state")
    val plain = Events.transitionMatrix(df, "u", Seq("ts", "id"),
      "state").collect().map(_.toSeq).toSet
    for (bucket <- Seq(1L, 10L, 100L, 100000L)) {
      val bucketed = Events.transitionMatrixBucketed(df, "u", "ts",
        Seq("id"), "state", bucketMicros = bucket)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"divergence at bucket width $bucket")
    }
  }

  test("skipGramPairs: window-bounded symmetric pairs, exact counts") {
    // user 1 sequence: A B C D with window 2 ->
    // forward pairs: AB AC BC BD CD; symmetric: 10 directed rows
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"),
      (1L, 4L, "D")).toDF("u", "seq", "item")
    val out = Events.skipGramPairs(ev, "u", Seq("seq"), "item", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out.size == 10)
    assert(out(("A", "B")) == 1L && out(("B", "A")) == 1L)
    assert(out(("A", "C")) == 1L)
    assert(!out.contains(("A", "D"))) // 3 positions apart
    // repeated co-occurrence accumulates
    val ev2 = Seq((1L, 1L, "X"), (1L, 2L, "Y"), (2L, 1L, "X"),
      (2L, 2L, "Y")).toDF("u", "seq", "item")
    val out2 = Events.skipGramPairs(ev2, "u", Seq("seq"), "item", 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out2(("X", "Y")) == 2L)
  }

  test("spikes: trailing baseline, z, zero-variance and short history") {
    // key g: values 1,1,1,1,100 -> the 100 sees base {1,1,1,1}: sd 0
    // -> spike (deviation on flat baseline); first 3 points: history
    // short (< minBase after 0/1/2 predecessors) -> nulls
    val s = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0),
      (5L, 100.0)).map { case (t, v) => ("g", t, v) }
      .toDF("k", "t", "v")
    val out = Events.spikes(s, "k", "t", "v", base = 4, k = 2.0)
      .orderBy("t").collect()
    assert(out.take(3).forall(_.isNullAt(out.head.fieldIndex("spike"))))
    val fourth = out(3) // base {1,1,1}: mean 1, sd 0, v=1 -> no spike
    assert(fourth.getAs[Boolean]("spike") == false)
    val fifth = out(4)  // base {1,1,1,1}: sd 0, v=100 -> spike
    assert(fifth.getAs[Boolean]("spike") == true)
    assert(fifth.isNullAt(fifth.fieldIndex("z"))) // sd 0 -> z null
    assert(fifth.getAs[Double]("base_mean") == 1.0)
    // varying baseline produces a real z
    val s2 = Seq(1.0, 3.0, 1.0, 3.0, 12.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("k", "t", "v")
    val r5 = Events.spikes(s2, "k", "t", "v", base = 4, k = 2.0)
      .orderBy("t").collect().last
    // base {1,3,1,3}: mean 2, sd 1 -> z = 10
    assert(r5.getAs[Double]("z") == 10.0)
    assert(r5.getAs[Boolean]("spike") == true)
    intercept[IllegalArgumentException] {
      Events.spikes(s2, "k", "t", "v", base = 2, k = 2.0, minBase = 3)
    }
  }
}
