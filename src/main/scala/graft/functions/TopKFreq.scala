package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grouped heavy-hitters: Misra-Gries top-k as a
  * `TypedImperativeAggregate` — the altitude for aggregates whose
  * state is a data structure, not a column vector (Spark's own
  * `freqItems` is whole-DataFrame only; there is no built-in per-GROUP
  * frequent-items aggregate).
  *
  * State is k counters (a map), so memory is O(k) per group no matter
  * how many rows flow through — the property that lets a hot-token
  * scan run over 100 TB with map-side partial aggregation like any
  * sum. Guarantee (classic MG): any item with true frequency
  * > n/(k+1) in a group of n rows is present in that group's output,
  * under any partitioning and merge order; reported counts are lower
  * bounds. Items near the threshold may differ with partitioning —
  * the guarantee, not the margin, is the contract (spec-verified).
  */
case class TopKFreq(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Weighted MG insert; on overflow decrement all counters by the
    * smallest involved weight and drop zeros (the mergeable form). */
  private def add(buf: mutable.HashMap[String, Long],
                  item: String, w: Long): Unit = {
    if (buf.contains(item)) buf(item) += w
    else if (buf.size < k) buf(item) = w
    else {
      val m = math.min(w, buf.valuesIterator.min)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - m)
      buf.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(buf.remove)
      if (w > m) buf(item) = w - m
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (i, w) => add(b1, i, w) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(top.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) => out.writeUTF(i); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (1 to n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_freq"
}

object TopKFreq {
  /** DataFrame surface: `topk_freq(col, k)` aggregate Column. */
  def topkFreq(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKFreq(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
