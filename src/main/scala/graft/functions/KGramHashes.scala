package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The rolling Karp–Rabin kernel, Java-callable from generated code.
  * Kept OUTSIDE the expression so interpreted eval and codegen run the
  * exact same bytes (the [[WordNGramsUtil]] pattern).
  */
object KGramHashesUtil {
  /** Polynomial hash (base 31, mod 1e9+7) of every k-char-gram of
    * `text`, over Unicode CODE POINTS — exactly the values of the HOF
    * chain it replaces:
    * `transform(sequence(1, length(t)-k+1),
    *    i -> aggregate(filter(split(substr(t,i,k),''), c -> c != ''),
    *                   0L, (acc,c) -> (acc*31 + ascii(c)) % M))`
    * (`split('')` emits one string per code point; `ascii` returns the
    * code point), and of the DuckDB `list_reduce` mirror in the
    * doc_fingerprint / dedup_winnow oracles. The fold re-hashes k
    * chars at every position — O(k·L) interpreted lambda evals per
    * doc; this slides in O(L): drop the leading char's `cp·31^(k-1)`
    * term, multiply by 31, add the entering char. Same residues
    * because both compute Σ cp_j·31^(k-1-j) mod M at each window. */
  def hashes(text: UTF8String, k: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val cps = text.toString.codePoints.toArray
    val len = cps.length
    if (len < k) return new GenericArrayData(Array.empty[Any])
    val M = 1000000007L
    var pk = 1L // 31^(k-1) mod M: weight of the window's leading char
    var i = 1
    while (i < k) { pk = pk * 31 % M; i += 1 }
    val out = new Array[Any](len - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + cps(i)) % M; i += 1 }
    out(0) = h
    i = k
    while (i < len) {
      // cp ≤ 0x10FFFF and pk < M ⇒ the product stays far inside Long;
      // one re-fold after the subtraction restores the sign
      h = ((h - cps(i - k) * pk) % M + M) % M
      h = (h * 31 + cps(i)) % M
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `kgram_hashes(text, k)` — native Catalyst expression emitting the
  * array of rolling k-gram hashes of a string: the character-shingle
  * twin of [[WordNGrams]], backing the winnowing fingerprint pipeline
  * (dedup_winnow) and doc_fingerprint's min-8-gram. Registered in
  * [[GraftExtensions]]; DataFrame surface `TextFunctions.kgramHashes`.
  *
  * Replacing the HOF fold matters twice at 100 TB: the values are
  * computed ROLLING (O(L) vs O(k·L) per doc), and the loop runs as one
  * static-method call inside whole-stage codegen instead of ~k·L
  * boxed interpreted lambda frames (measured on dedup_winnow at
  * sf0.1: the hash stage dominated an 8.5 s query).
  */
case class KGramHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"kgram_hashes: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes expects a string column, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    KGramHashesUtil.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.KGramHashesUtil.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): KGramHashes =
    copy(child = newChild)
}
