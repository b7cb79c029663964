package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a mergeable aggregate: at most
  * `capacity` counters, O(capacity) memory regardless of input size or
  * distinct count. Guarantee (Misra-Gries / mergeable-summaries): every
  * item with true count > N/(capacity+1) survives in the sketch, and
  * each surviving counter undercounts by at most N/(capacity+1). The
  * emitted set is therefore a guaranteed SUPERSET of the heavy hitters
  * at that threshold — callers re-count candidates exactly for an
  * exact, deterministic final answer ([[graft.operators.Frequency]]).
  *
  * Merge is the offset-subtract construction (sum counters; if over
  * capacity, subtract the (capacity+1)-th largest and drop non-
  * positive), which preserves the error bound under arbitrary merge
  * trees — safe for Spark's partial/final aggregation.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType),
      StructField("cnt", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def shrink(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      // subtract the (capacity+1)-th largest from everything
      val off = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val c = buf(k) - off
        if (c > 0) buf(k) = c else dead += k
      }
      dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None =>
          buf(s) = 1L
          shrink(buf)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf(k) = buf.getOrElse(k, 0L) + c
    }
    shrink(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic emission order: count desc, then item
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }.map {
      case (k, c) => InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long])
      : Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesAgg = copy(child = newChild)
}

object MisraGriesAgg {
  /** Column wrapper: `misra_gries(item, capacity)` as an aggregate. */
  def sketch(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
