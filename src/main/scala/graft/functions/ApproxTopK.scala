package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a TypedImperativeAggregate —
  * the imperative-buffer aggregate shape for sketches that aren't
  * expressible as pure expressions (cf. DeclarativeAggregate).
  *
  * Memory is bounded by `capacity` counters per group regardless of input
  * cardinality: when a new item arrives at a full sketch it evicts the
  * minimum counter and inherits its count as overestimation error
  * (Metwally et al., "Efficient computation of frequent and top-k
  * elements in data streams"). Partial sketches merge associatively, so
  * the operator gets map-side partials + one shuffle of
  * O(capacity)-sized buffers — constant bytes per group at any SF.
  *
  * When capacity >= true distinct count the sketch degenerates to exact
  * counts (error 0), which is what the oracle-checked query relies on.
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  // item -> (count, error)
  type Buf = mutable.LinkedHashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf = mutable.LinkedHashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.toString
    buf.get(item) match {
      case Some((c, e)) => buf(item) = (c + 1, e)
      case None if buf.size < capacity => buf(item) = (1L, 0L)
      case None =>
        // evict the min counter; newcomer inherits its count as error
        val (minItem, (minC, _)) = buf.minBy { case (_, (c, _)) => c }
        buf.remove(minItem)
        buf(item) = (minC + 1, minC)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // standard SpaceSaving merge: pointwise sum, then trim to capacity
    b.foreach { case (item, (c, e)) =>
      a.get(item) match {
        case Some((c0, e0)) => a(item) = (c0 + c, e0 + e)
        case None => a(item) = (c, e)
      }
    }
    if (a.size > capacity) {
      val kept = a.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      a.clear()
      kept.foreach { case (i, ce) => a(i) = ce }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val top = buf.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) } // count desc, item asc: total order
      .take(k)
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }
    new GenericArrayData(top)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf: Buf = mutable.LinkedHashMap.empty
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = (in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count", LongType),
    StructField("error", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "approx_top_k_ss"

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopK =
    copy(child = newChildren.head)
}

object ApproxTopK {
  /** Column API: SpaceSaving top-k of a string column. */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    ColumnShim.toColumn(
      ApproxTopK(ColumnShim.toExpression(c), k, capacity)
        .toAggregateExpression())
}
