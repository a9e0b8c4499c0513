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
  * the byte CONTENT (length gate + Arrays.equals): UnsafeRow returns a
  * fresh array per field access, so a reference key would never hit.
  * The equality scan is linear in sketch size but far cheaper than
  * readFrom (which allocates the d×w counter matrix); in the intended
  * shape (tiny probe set × per-group sketch join) consecutive rows
  * carry equal bytes, so deserialization happens once per group per
  * partition. CodegenFallback is deliberate — this sits on the
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
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("cms_estimate needs a binary sketch as first arg, got " +
          left.dataType.sql)
    else if (right.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("cms_estimate probes items as their UTF-8 bytes; " +
          "second arg must be STRING (cast it), got " + right.dataType.sql)
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedSketch == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
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
