package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by Spark's
  * built-in `count_min_sketch` aggregate) for one item's estimated
  * frequency — the missing read half that makes CMS usable inside a
  * query: build the model-sized sketch per group once, broadcast it,
  * and estimate any number of items DISTRIBUTED, instead of
  * collect()ing sketches to the driver.
  *
  * The deserialized sketch is cached per expression instance keyed on
  * the byte array's reference: in the intended shape (tiny probe set ×
  * per-group sketch join) consecutive rows carry the same sketch
  * object, so deserialization happens once per group per partition,
  * not once per row. CodegenFallback is deliberate — this sits on the
  * model-probe path (rows ≈ probes × groups), never on the data path.
  *
  * Items are estimated as their UTF-8 bytes, mirroring how the
  * aggregate adds StringType values. CMS errs only upward:
  * estimate ≥ true count, ≤ true + ε·n with the aggregate's
  * confidence — bounds the OperatorSpec verifies.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (left.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("cms_estimate needs a binary sketch as first arg")

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if ((cachedBytes ne bytes) || cachedSketch == null) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftColumnBridge.column(CmsEstimate(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(item)))
}
