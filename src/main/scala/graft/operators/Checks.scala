package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification — the contract gate a
  * training-data pipeline runs before promoting a snapshot (the
  * Deequ-shaped need, engine-native): completeness, uniqueness,
  * range/set membership, and referential integrity as a typed rule
  * list evaluated in as few passes as the rules allow, emitting one
  * (rule, column, metric, threshold, pass) row per rule.
  *
  * Pass structure, stated not implied: every ROW-LEVEL rule
  * (not-null, in-range, in-set) compiles to one conditional-count
  * expression and ALL of them run in a single map-side-combinable
  * aggregation — one scan however many rules. Each [[Checks.Unique]]
  * adds an exact `count_distinct` to that same aggregate; Spark plans
  * multiple distinct aggregates with an Expand (one scan, one
  * duplicated row stream per distinct column) — fine for a handful of
  * uniqueness rules; audit wide-column uniqueness with
  * [[Profile.profile]]'s melt shape instead. Each
  * [[Checks.RefIntegrity]] is its own broadcast-friendly left-anti
  * probe (orphan count), the only rule that touches a second table.
  *
  * Determinism: metrics are exact counts turned into one
  * HALF_UP-rounded ratio (6 places) — bit-replayable by a SQL oracle;
  * thresholds compare on the ROUNDED metric so engines agree on
  * `pass` exactly — EXCEPT when `minRatio == 1.0`, where every rule
  * gates on the EXACT count (satisfying == n): at n >= 2,000,001 a
  * single violating row rounds to 1.000000 and a rounded-metric gate
  * would silently pass, exactly the failure a 100 TB contract cannot
  * afford. Unique and RefIntegrity were always exact; the rounded
  * metric stays in the output for reporting either way.
  */
object Checks {

  sealed trait Rule { def name: String; def column: String }
  /** share of non-null values must reach `minRatio`. */
  final case class NotNull(column: String, minRatio: Double = 1.0)
      extends Rule { val name = "not_null" }
  /** column values must be globally unique, exact: distinct count
    * (with NULL counted as one value, so a single null row can still
    * be unique while two null rows are duplicates) must equal the row
    * count. Pair with [[NotNull]] when null ids are themselves
    * violations.
    */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }
  /** share of ALL rows inside [lo, hi] must reach `minRatio` — the
    * denominator is the row count, so NULLs count as violations (a
    * mostly-null column fails; pair with a lower `minRatio` or a
    * [[NotNull]] rule when null-tolerance is wanted).
    */
  final case class InRange(column: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Rule { val name = "in_range" }
  /** share of ALL rows in the accepted set must reach `minRatio`;
    * NULLs count as violations (see [[InRange]]).
    */
  final case class InSet(column: String, values: Seq[String],
      minRatio: Double = 1.0) extends Rule { val name = "in_set" }
  /** share of ALL rows matching the SQL LIKE pattern
    * (`%`/`_` wildcards — identical semantics in Spark and ANSI SQL,
    * unlike regex dialects) must reach `minRatio`; NULLs count as
    * violations (see [[InRange]]).
    */
  final case class Like(column: String, pattern: String,
      minRatio: Double = 1.0) extends Rule { val name = "like" }
  /** share of rows satisfying an arbitrary SQL boolean expression
    * (cross-column rules: `"a <= b"`, `"ship_date >= order_date"`)
    * must reach `minRatio`. The expression must be ANSI SQL an
    * external oracle evaluates identically; NULL counts as not
    * satisfied. `column` is a display label only.
    */
  final case class Predicate(column: String, sqlExpr: String,
      minRatio: Double = 1.0) extends Rule { val name = "predicate" }
  /** every non-null FK value must exist in `dim.pkCol` (metric =
    * orphan share, passes only when the EXACT orphan count is 0).
    */
  final case class RefIntegrity(column: String, dim: DataFrame,
      pkCol: String) extends Rule { val name = "ref_integrity" }

  private def round6(c: Column): Column = round(c, 6)

  /** Evaluate the rules; see the object scaladoc for the pass
    * structure. Empty input: ratio rules report metric 1.0 (nothing
    * violated nothing), uniqueness and RI likewise pass.
    *
    * @return (rule, column, metric, threshold, pass), one row per
    *   rule, in the order given
    */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val spark = df.sparkSession
    import spark.implicits._
    val rowRules = rules.zipWithIndex
      .filter(!_._1.isInstanceOf[RefIntegrity])
    // one aggregation for every row-level + uniqueness rule: the
    // single driver row below is metadata-scale by construction.
    // Every aggregate is coalesced — sum/max over ZERO rows is NULL,
    // and getLong on a null slot throws, so an empty input would
    // otherwise crash the gate instead of vacuously passing.
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: rowRules
      .map { case (r, i) =>
        val m = r match {
          case NotNull(c, _) => count(col(c))
          case Unique(c) =>
            // nulls counted as ONE value (the scaladoc contract):
            // count_distinct excludes them, so add the null flag back
            count_distinct(col(c)) +
              coalesce(max(when(col(c).isNull, 1L).otherwise(0L)),
                lit(0L))
          case InRange(c, lo, hi, _) =>
            coalesce(sum(when(col(c).isNotNull &&
              col(c).cast("double").between(lo, hi), 1L)
              .otherwise(0L)), lit(0L))
          case InSet(c, vs, _) =>
            coalesce(sum(when(col(c).isNotNull &&
              col(c).cast("string").isin(vs: _*), 1L)
              .otherwise(0L)), lit(0L))
          case Like(c, pat, _) =>
            coalesce(sum(when(col(c).isNotNull &&
              col(c).cast("string").like(pat), 1L)
              .otherwise(0L)), lit(0L))
          case Predicate(_, sqlExpr, _) =>
            coalesce(sum(when(coalesce(expr(sqlExpr), lit(false)), 1L)
              .otherwise(0L)), lit(0L))
          case x => throw new IllegalArgumentException(x.toString)
        }
        m.as(s"__m$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(0)
    def ratio(num: Long): Double =
      if (n == 0) 1.0
      else BigDecimal(num.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // gate on the EXACT count when the threshold is 1.0: the rounded
    // ratio saturates to 1.000000 from n >= 2,000,001 rows with one
    // violation, and "every row must conform" is precisely the
    // contract that must not be lossy. Sub-1.0 thresholds keep the
    // rounded-metric comparison so oracle engines agree bit-for-bit.
    def gate(m: Long, t: Double): Boolean =
      if (t >= 1.0) m == n else ratio(m) >= t
    // results keyed by the rule's POSITION in the caller's list, so
    // two rules of one type on one column report independently
    // (keying by (name, column) collapsed them to the first rule's
    // threshold and verdict)
    val results = new Array[(String, String, Double, Double, Boolean)](
      rules.size)
    rowRules.zipWithIndex.foreach { case ((r, pos), slot) =>
      val m = row.getLong(slot + 1)
      results(pos) = r match {
        case NotNull(c, t) => (r.name, c, ratio(m), t, gate(m, t))
        case Unique(c) =>
          // pass on the EXACT count equality, not the rounded ratio
          (r.name, c, ratio(m), 1.0, m == n)
        case InRange(c, _, _, t) =>
          (r.name, c, ratio(m), t, gate(m, t))
        case InSet(c, _, t) => (r.name, c, ratio(m), t, gate(m, t))
        case Like(c, _, t) => (r.name, c, ratio(m), t, gate(m, t))
        case Predicate(c, _, t) =>
          (r.name, c, ratio(m), t, gate(m, t))
        case x => throw new IllegalStateException(x.toString)
      }
    }
    // ALL referential-integrity probes share ONE action: each
    // anti-join emits its rule position, the union is counted per
    // position in a single job (one sequential `.count()` per rule
    // serialized R probes — needless latency on a 50-rule contract).
    // A rule absent from the grouped counts had zero orphans.
    val riRules = rules.zipWithIndex.collect {
      case (r: RefIntegrity, pos) => (r, pos)
    }
    if (riRules.nonEmpty) {
      val tagged = riRules.map { case (RefIntegrity(c, dim, pk), pos) =>
        df.where(col(c).isNotNull)
          .join(dim.select(col(pk).as("__pk")).distinct(),
            col(c) === col("__pk"), "left_anti")
          .select(lit(pos).as("__rule"))
      }.reduce(_ union _)
      val orphanCounts = tagged.groupBy("__rule").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      riRules.foreach { case (RefIntegrity(c, _, _), pos) =>
        val orphans = orphanCounts.getOrElse(pos, 0L)
        val share =
          if (n == 0) 0.0
          else BigDecimal(orphans.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        // pass on the EXACT orphan count: a 6-place-rounded share of
        // 0.000000 can hide real orphans at large n
        results(pos) = ("ref_integrity", c, share, 0.0, orphans == 0L)
      }
    }
    results.toSeq
      .toDF("rule", "column", "metric", "threshold", "pass")
  }
}
