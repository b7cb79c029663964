package graft.operators

import org.apache.spark.sql.DataFrame
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

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: Option[String] = None): DataFrame = {
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

    // (time, side, tie): right rows sort before left rows at equal time
    // (inclusive match), later ties win within a side.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(f => col(s"__asof.$f").as(f)): _*)
  }
}
