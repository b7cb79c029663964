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
}
