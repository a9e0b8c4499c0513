package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing kernel, Java-callable from generated code (the
  * [[WordNGramsUtil]] pattern: interpreted eval and codegen run the
  * exact same bytes).
  */
object WinnowFingerprintsUtil {
  /** DISTINCT winnowed fingerprints of `text`: the minimum of each
    * window of `w` consecutive rolling k-gram hashes (base-31
    * mod-1e9+7 over code points — [[KGramHashesUtil]]'s residues,
    * verbatim), deduplicated in first-seen order. Set-identical to
    * the relational spelling `posexplode(kgram_hashes(t, k))` → count
    * + sliding-min windows → distinct (and to the DuckDB
    * `list_distinct(list_transform(..., j -> list_min(hs[j:j+w-1])))`
    * oracle): winnowing consumers compare fingerprint SETS, so
    * emission order never reaches a result. The sliding min uses a
    * monotonic deque — O(L) total, not O(L·w). Shorter than k+w-1
    * chars ⇒ no full window ⇒ empty. */
  def fingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val hs = KGramHashesUtil.hashes(text, k)
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val deque = new Array[Int](n) // indices, front..back increasing hash
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      while (tail > head && hs.getLong(deque(tail - 1)) >= h) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hs.getLong(deque(head))
        if (seen.add(m)) out.add(m)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fingerprints(text, k, w)` — native Catalyst
  * [[CollectionGenerator]] emitting each distinct winnowed fingerprint
  * of a document as a row: the fused form of the dedup_winnow front
  * end. The relational spelling exploded EVERY k-gram hash (~L rows
  * per doc), shuffled them into a per-doc sort for the sliding-min
  * window, and distinct'd — three wide ops proportional to corpus
  * CHARACTERS. This emits the ~2/(w+1)-density winnowed set straight
  * from one O(L) map-side pass, so the first wide op downstream
  * already runs on the sampled fingerprints. Registered in
  * [[GraftExtensions]]; DataFrame surface
  * `TextFunctions.winnowFingerprints`.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CollectionGenerator {

  require(k >= 1 && w >= 1,
    s"winnow_fingerprints: k and w must be >= 1, got k=$k w=$w")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def elementSchema: StructType =
    new StructType().add("fp", LongType, nullable = false)
  override def collectionType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string column, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = WinnowFingerprintsUtil.fingerprints(
      child.eval(input).asInstanceOf[UTF8String], k, w)
    val out = new Array[InternalRow](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = new GenericInternalRow(Array[Any](arr.getLong(i)))
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.WinnowFingerprintsUtil.fingerprints(
        |    ${childGen.isNull} ? null : ${childGen.value}, $k, $w);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}
