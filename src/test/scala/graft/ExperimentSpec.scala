package graft

import graft.operators.Experiment

/** Hand-computed Welch readout fixtures. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // control: 1,2,3 (mean 2, var 1); treat: 2,4 (mean 3, var 2)
  private def log = Seq(
    ("ctl", 1.0), ("ctl", 2.0), ("ctl", 3.0),
    ("trt", 2.0), ("trt", 4.0), (null, 9.0)
  ).toDF("arm", "value")

  test("armSummary: exact moments, singleton variance null") {
    val out = Experiment.armSummary(log, "arm", "value").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("ctl", "trt"))
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getAs[Double]("variance"))).toMap
    assert(m("ctl") == ((3L, 2.0, 1.0)))
    assert(m("trt") == ((2L, 3.0, 2.0)))
    val single = Seq(("a", 5.0)).toDF("arm", "value")
    val r1 = Experiment.armSummary(single, "arm", "value")
      .collect().head
    assert(r1.isNullAt(r1.fieldIndex("variance")))
  }

  test("compare: Welch se and t against the control arm") {
    val r = Experiment.compare(log, "arm", "value", "ctl")
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "trt")
    assert(row.getAs[Long]("n_t") == 2 && row.getAs[Long]("n_c") == 3)
    assert(row.getAs[Double]("lift_abs") == 1.0)
    assert(row.getAs[Double]("lift_rel") == 0.5)
    val se = math.sqrt(2.0 / 2 + 1.0 / 3)
    assert(math.abs(row.getAs[Double]("se") - se) < 1e-6)
    assert(math.abs(row.getAs[Double]("t_stat") - 1.0 / se) < 1e-6)
  }

  test("compare: zero control mean nulls relative lift") {
    val z = Seq(("c", 1.0), ("c", -1.0), ("t", 2.0), ("t", 3.0))
      .toDF("arm", "value")
    val row = Experiment.compare(z, "arm", "value", "c")
      .collect().head
    assert(row.isNullAt(row.fieldIndex("lift_rel")))
    assert(row.getAs[Double]("lift_abs") == 2.5)
  }
}
