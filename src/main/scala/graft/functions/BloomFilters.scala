package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Semi-join reduction for shuffles too big to broadcast as rows.
  *
  * The pattern: a filtered build side whose ROWS are beyond the
  * broadcast threshold often has a KEY SET that fits a few MB of bloom
  * bits (10 bits/key at 1% fpp). Build the filter as an aggregate
  * (map-side mergeable: partials OR together), broadcast the one-row
  * result, and pre-filter the probe side BEFORE its shuffle — the
  * exact join afterwards clears the false positives, so results are
  * identical to the plain join while the probe shuffle moves only
  * ~matching rows. Catalyst has this machinery internally (runtime
  * bloom filter injection) but exposes no SQL/DataFrame surface to
  * build or probe a filter explicitly; these two expressions are that
  * surface.
  *
  * `BloomAgg` state is one `org.apache.spark.util.sketch.BloomFilter`
  * (size fixed by expectedItems/fpp at plan time, independent of row
  * count); merge is bitwise OR, so any partitioning and merge order
  * produces the same bits.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_agg hashes keys as longs; child must be BIGINT (cast it), got " +
        child.dataType.sql)

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_agg"
}

/** Probe a serialized bloom filter for a long key. Never false-negative
  * (a key that was put always answers true); false-positive rate ≈ the
  * fpp the filter was built with. Same content-keyed one-entry cache as
  * [[CmsEstimate]]: UnsafeRow hands back a fresh byte array per field
  * access, and in the intended shape (one broadcast filter × many probe
  * rows) consecutive rows carry equal bytes, so deserialization happens
  * once per partition. CodegenFallback is acceptable here ONLY because
  * the probe is a single hash — cheap relative to the shuffle it
  * saves; measured in BloomSpec.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain needs a binary filter as first arg, got " +
          left.dataType.sql)
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain probes BIGINT keys (cast it), got " +
          right.dataType.sql)
    else TypeCheckResult.TypeCheckSuccess

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  override protected def nullSafeEval(bf: Any, key: Any): Any = {
    val bytes = bf.asInstanceOf[Array[Byte]]
    // reference check first: the intended shape feeds the SAME array
    // object every row (a plan-constant Literal), and a content
    // compare of megabytes of filter bits per probe row would cost
    // more than the shuffle the filter saves
    if (cachedFilter == null ||
        ((cachedBytes ne bytes) && !java.util.Arrays.equals(cachedBytes, bytes))) {
      cachedFilter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedFilter.mightContainLong(key.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFilters {
  /** Aggregate Column: build a bloom filter over a BIGINT key column. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    GraftColumnBridge.column(
      BloomAgg(GraftColumnBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  /** Scalar Column: probe a serialized filter for a BIGINT key. */
  def bloomMightContain(filter: Column, key: Column): Column =
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expression(filter),
      GraftColumnBridge.expression(key)))
}
