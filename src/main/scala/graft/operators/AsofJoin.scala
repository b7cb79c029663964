package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `right.time <= left.time` on the same key (backward, inclusive) —
  * the time-series decoration primitive Spark lacks as a built-in.
  *
  * Implemented with the union + window technique: tag both sides, union
  * them, and carry the most recent right payload forward with one
  * `last(ignoreNulls)` window pass per key. The alternatives fail at
  * scale — a range-condition join degenerates to a per-key cross
  * product, and the broadcast-binary-search trick caps the right side
  * at driver memory. This shape is ONE shuffle of (left + right) on the
  * key, linear within each partition, and skew follows the key
  * distribution like any aggregation.
  *
  * The right payload travels as a struct, so a right row whose payload
  * FIELDS are null still wins over an older row (ignoreNulls skips only
  * carried left rows, never mixes two right rows). Ties: a right row at
  * exactly left.time matches (inclusive); among right rows with equal
  * time the greatest `tieCol` wins (pass one for determinism when the
  * time column can repeat per key).
  */
object AsofJoin {

  /** Tagged union of both sides: (keys, time, __side, __tie, __pay,
    * left-only columns). Right rows sort before left rows at equal
    * time (inclusive match); later ties win within a side.
    */
  private def prep(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: Option[String])
      : (DataFrame, DataFrame, Seq[String]) = {
    val leftOther = left.columns.toSeq.filterNot(keys.contains)
    val payloadCols = right.columns.toSeq
      .filterNot(c => keys.contains(c) || c == timeCol)
    require(leftOther.intersect(payloadCols).isEmpty,
      s"column clash: ${leftOther.intersect(payloadCols)}")

    val rightStruct = struct(payloadCols.map(col): _*)
    val nullPayload = lit(null).cast(
      right.select(rightStruct).schema.head.dataType)
    val tie = tieCol.map(col).getOrElse(lit(null).cast("long"))

    val l2 = left.select(
      (keys :+ timeCol).map(col) ++ Seq(lit(1).as("__side"),
        lit(null).cast("long").as("__tie"), nullPayload.as("__pay")) ++
        leftOther.filterNot(_ == timeCol).map(col): _*)
    val r2 = right.select(
      (keys :+ timeCol).map(col) ++ Seq(lit(0).as("__side"),
        tie.cast("long").as("__tie"), rightStruct.as("__pay")) ++
        leftOther.filterNot(_ == timeCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    (l2.unionByName(r2), r2, payloadCols)
  }

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: Option[String] = None): DataFrame = {
    val (unioned, _, payloadCols) = prep(left, right, keys, timeCol, tieCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(f => col(s"__asof.$f").as(f)): _*)
  }

  /** [[asofBackward]] with data-driven shape selection: probe the
    * per-key volume of the UNION of both sides (both feed the carry
    * window's sort, so the hot-key cost is their combined timeline;
    * [[graft.operators.ShapeSelect.decide]]) and route plain on
    * uniform keys, [[asofBackwardBucketed]] when a hot entity is
    * present. Output identical either way (same DuckDB ASOF oracle).
    *
    * `bucketSpan = 0` derives the span from the probed time range:
    * range / `targetBuckets` (min 1), i.e. a hot key's timeline
    * spreads over up to `targetBuckets` reducers — the probe already
    * carries the bounds, so no extra scan. Pass an explicit span to
    * pin bucket boundaries (e.g. daily) instead.
    */
  def asofBackwardAuto(left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String, tieCol: Option[String] = None,
      bucketSpan: Long = 0L, targetBuckets: Int = 256,
      shareThreshold: Double = ShapeSelect.DefaultShareThreshold,
      maxKeyRows: Long = ShapeSelect.DefaultMaxKeyRows,
      probeFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(targetBuckets > 0,
      s"targetBuckets must be > 0, got $targetBuckets")
    def proj(df: DataFrame): DataFrame =
      df.select(keys.map(col) :+ col(timeCol).cast("long")
        .as(timeCol): _*)
    val d = ShapeSelect.decide(proj(left).unionByName(proj(right)),
      keys, timeCol, shareThreshold, maxKeyRows, probeFraction, seed)
    if (!d.bucketed) asofBackward(left, right, keys, timeCol, tieCol)
    else {
      val span =
        if (bucketSpan > 0) bucketSpan
        else math.max(1L, (d.maxTime - d.minTime) / targetBuckets + 1)
      asofBackwardBucketed(left, right, keys, timeCol, tieCol, span)
    }
  }

  /** Hot-key-safe [[asofBackward]]: identical output, but the carry
    * window is salted with a time bucket so no reducer ever sorts one
    * key's whole timeline (the x100 skew probe priced that sort at
    * 1.4x-and-growing on a 14% hot key; at 100 TB a billion-event
    * entity makes the plain shape a single unbounded task).
    *
    * Phase 1 runs the same last-right-payload carry within each
    * (key, time bucket). A row whose bucket holds no earlier right row
    * needs the latest right payload from SOME earlier bucket: phase 2
    * reduces each (key, bucket) to its last right payload (one summary
    * row), chains "latest payload before this bucket" over the per-key
    * bucket sequence — O(buckets) per key, empty buckets simply absent
    * — and joins the carry back on the (key, bucket) partitioning
    * phase 1 already established. `coalesce(local, carry)` is then the
    * exact as-of payload: a local hit is always newer than any earlier
    * bucket's, and every earlier-bucket right row is at-or-before any
    * time in this bucket.
    *
    * `bucketSpan` is in `timeCol`'s own units (e.g. 86400e6 for daily
    * buckets over epoch-microseconds); `timeCol` must be non-null.
    */
  def asofBackwardBucketed(left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String, tieCol: Option[String] = None,
      bucketSpan: Long): DataFrame = {
    require(bucketSpan > 0, s"bucketSpan must be > 0, got $bucketSpan")
    val (unioned, r2, payloadCols) = prep(left, right, keys, timeCol, tieCol)
    val tL = col(timeCol).cast("long")
    // exact floor division via pmod (negative times included)
    val bkt = ((tL - pmod(tL, lit(bucketSpan))) / lit(bucketSpan))
      .cast("long")
    val tagged = unioned.withColumn("__bkt", bkt)
    val kb = (keys :+ "__bkt").map(col)
    val w1 = Window.partitionBy(kb: _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = tagged.withColumn("__local",
      last(col("__pay"), ignoreNulls = true).over(w1))
    // one row per (key, bucket-with-a-right-row): the bucket's last
    // right payload, reduced from the RIGHT side alone — deriving it
    // from `tagged` would re-run the full union+shuffle a second time
    // (the partial-agg below the exchange defeats reuse), where the
    // right side is the smaller input and aggregates map-side.
    // max_by on (time, tie) mirrors w1's in-bucket right order; the
    // window's asc-nulls-first tie equals coalesce(tie, MIN). Buckets
    // with no right row are simply absent: the carry window's
    // last(ignoreNulls) runs over present buckets only, and the left
    // join leaves a null carry before the first right bucket.
    val summary = r2.withColumn("__bkt", bkt).groupBy(kb: _*)
      .agg(max_by(col("__pay"),
        struct(tL.as("t"), coalesce(col("__tie"), lit(Long.MinValue))
          .as("tb"))).as("__bucketLast"))
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bkt")).rowsBetween(Window.unboundedPreceding, -1)
    // "latest right payload in any STRICTLY EARLIER bucket" must see
    // every bucket the left frame occupies, not only right buckets:
    // project the carry onto the union's bucket roster via a window
    // over the merged (bucket, bucketLast) rows, right-rows-absent
    // buckets contributing null payloads the ignoreNulls carry skips.
    // null-safe key joins throughout: the plain shape's window groups
    // NULL keys into one partition and emits their rows (null-key
    // rights match null-key lefts); null-rejecting equi-joins here
    // silently dropped them (round-15 review). __bkt is non-null by
    // the timeCol contract.
    def nullSafeOn(l: DataFrame, r: DataFrame): Column =
      keys.map(k => l(k) <=> r(k))
        .reduce(_ && _) && l("__bkt") === r("__bkt")
    val buckets = tagged.select(kb: _*).distinct()
    val roster = buckets.join(summary, nullSafeOn(buckets, summary),
        "left")
      .select(buckets("__bkt") +: keys.map(buckets(_)) :+
        summary("__bucketLast"): _*)
    val carry = roster
      .withColumn("__carry",
        last(col("__bucketLast"), ignoreNulls = true).over(wCarry))
      .select(kb :+ col("__carry"): _*)
    // SHUFFLE_HASH: the build side (carry, one row per occupied
    // bucket) is the collapsed summary — a per-partition hash map over
    // it never sorts the full event volume, and unlike BROADCAST it
    // has no driver-memory bound (at scale carry is keys x buckets).
    val carryH = carry.hint("SHUFFLE_HASH")
    local.join(carryH, nullSafeOn(local, carryH))
      .withColumn("__asof", coalesce(col("__local"), carryH("__carry")))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(local(_)) ++
        payloadCols.map(f => col(s"__asof.$f").as(f)): _*)
  }

  /** Point-in-time join: each fact decorated with the dimension
    * VERSION whose validity interval contains the fact's time — the
    * lookup side of [[graft.operators.Events.scd2]]'s output (or any
    * (key, valid_from, valid_to-nullable) interval table with
    * disjoint intervals per key). Composed, not reimplemented: an
    * [[asofBackward]] on `valid_from` finds the last version opened
    * at or before the fact (inclusive — a fact at the exact change
    * instant sees the NEW version), then payloads are nulled where
    * the version had already CLOSED before the fact (possible only
    * with gapped intervals; SCD2 output is contiguous, so there the
    * containment check is free). Facts before the key's first
    * version, or on unknown keys, carry null payloads — left-outer
    * semantics throughout. Inherits asof's scale shape; swap in
    * [[asofBackwardBucketed]] upstream for hot keys the same way.
    */
  def pointInTime(facts: DataFrame, dims: DataFrame, keys: Seq[String],
      factTimeCol: String, validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(dims.columns.contains(validFromCol) &&
      dims.columns.contains(validToCol),
      s"dims must carry $validFromCol/$validToCol: ${dims.columns.toSeq}")
    // The asof ordering routes through a rename of validFromCol to the
    // fact's time column; if dims ALREADY carries a column by that name
    // (easy when both sides derive from the same event table) the rename
    // would produce duplicate column names and silently ambiguous
    // downstream references — refuse loudly instead.
    require(validFromCol == factTimeCol ||
      !dims.columns.contains(factTimeCol),
      s"dims already has a column named '$factTimeCol'; rename or drop " +
        s"it before pointInTime (asof ordering is carried by " +
        s"'$validFromCol' renamed to '$factTimeCol')")
    val dimsT = dims.withColumnRenamed(validFromCol, factTimeCol)
    val payload = dimsT.columns
      .filterNot(c => keys.contains(c) || c == factTimeCol).toSeq
    val joined = asofBackward(facts, dimsT, keys, factTimeCol)
    val flagged = joined.withColumn("__pit_ok",
      col(validToCol).isNull || col(factTimeCol) < col(validToCol))
    payload.foldLeft(flagged)((df, c) =>
      df.withColumn(c, when(col("__pit_ok"), col(c))))
      .drop("__pit_ok")
  }
}
