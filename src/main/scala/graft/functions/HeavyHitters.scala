package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch as a TypedImperativeAggregate: the
  * top-k most frequent values of a string column with a bounded buffer
  * (Metwally et al. 2005, "Efficient computation of frequent and top-k
  * elements in data streams").
  *
  * The buffer holds at most `capacity` counters per partition; buffers
  * merge associatively, so the aggregate runs as a normal two-phase
  * (partial → final) Spark aggregation — the 100 TB way to ask "what are
  * the most common tokens/hosts/templates" without a full groupBy over
  * every distinct value. When `capacity` exceeds the true distinct count
  * the result is exact.
  *
  * Returns array<struct<value string, count long>>, ordered by
  * (count desc, value asc).
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1 && capacity >= k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("count", LongType))))
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      if (b.contains(s) || b.size < capacity) b.update(s, b.getOrElse(s, 0L) + 1)
      else {
        // space-saving eviction: replace the minimum counter
        val (mk, mv) = b.minBy(_._2)
        b.remove(mk)
        b.update(s, mv + 1)
      }
    }
    b
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (s, c) => (-c, s) }.take(capacity)
      a.clear()
      keep.foreach { case (s, c) => a.update(s, c) }
    }
    a
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val top = b.toSeq.sortBy { case (s, c) => (-c, s) }.take(k)
    new GenericArrayData(top.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (s, c) =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val c = in.readLong()
      b.update(new String(arr, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  def heavyHitters(c: Column, k: Int, capacity: Int = 4096): Column =
    ColumnBridge.column(
      HeavyHitters(ColumnBridge.expression(c), k, capacity).toAggregateExpression())
}
