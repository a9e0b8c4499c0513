package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The sliding-ngram kernel, Java-callable from generated code (the
  * Scala object compiles to a class with static forwarders). Kept
  * OUTSIDE the expression so interpreted eval and codegen run the
  * exact same bytes.
  */
object WordNGramsUtil {
  /** Sliding word n-grams over a single-space tokenization, exactly
    * mirroring the HOF pipeline it replaces:
    * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', w[i..i+n-1]))`
    * with `w = split(text, ' ')`. Two semantics quirks are preserved
    * deliberately so the swap is bit-identical under the existing
    * DuckDB oracles:
    *  - `split` keeps empty tokens (consecutive/trailing spaces), so
    *    grams can contain doubled spaces;
    *  - when the doc has FEWER than n words, `sequence(0, m-n)` runs
    *    DESCENDING through negative indices; under non-ANSI semantics
    *    each out-of-range `w[i]` is null and `concat_ws` skips nulls,
    *    so every emitted gram degenerates to "all m words", repeated
    *    (n-m+1) times. Under ANSI (the Spark 4 default) the chain
    *    instead ERRORS on the out-of-bounds index — it only ever ran
    *    because the fixtures have no short docs. The generator is
    *    TOTAL: it emits the non-ANSI degenerate multiset, making
    *    short docs safe where the chain was a latent crash.
    */
  def terms(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val words = text.toString.split(" ", -1)
    val m = words.length
    val hi = m - n
    if (hi >= 0) {
      val out = new Array[Any](hi + 1)
      var i = 0
      while (i <= hi) {
        val sb = new java.lang.StringBuilder
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // m < n: sequence(0, m-n) descends 0, -1, ..., m-n; in-range
      // words for window [i, i+n) are always words[0..m) ∩ [i, i+n),
      // which for every i in that range is ALL of words[0..m)
      val gram = UTF8String.fromString(words.mkString(" "))
      new GenericArrayData(Array.fill[Any](n - m + 1)(gram))
    }
  }
}

/** `word_ngrams(text, n)` — a native Catalyst [[CollectionGenerator]]
  * (UDTF surface): one Generate node emitting the sliding word
  * n-grams of a document, replacing the split → sequence → transform
  * → explode four-expression chain in the shingle pipelines. Beyond
  * demonstrating the Generator extension point, it is materially
  * leaner in the hot path: the HOF chain materializes the full words
  * array AND the full grams array per row before explode copies each
  * element out, while this emits grams straight from one tokenization
  * buffer. Codegen: GenerateExec's CollectionGenerator path consumes
  * [[doGenCode]]'s ArrayData inside whole-stage codegen — no
  * CodegenFallback. Registered in [[GraftExtensions]]; the DataFrame
  * surface is `TextFunctions.wordNGrams`.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator {

  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def elementSchema: StructType =
    new StructType().add("ngram", StringType, nullable = false)
  override def collectionType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects a string column, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    val arr = WordNGramsUtil.terms(t.asInstanceOf[UTF8String], n)
    val out = new Array[InternalRow](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = new GenericInternalRow(Array[Any](arr.getUTF8String(i)))
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
        |  graft.functions.WordNGramsUtil.terms(
        |    ${childGen.isNull} ? null : ${childGen.value}, $n);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** DataFrame-side binding (no SQL registration needed — same pattern
  * as [[VecFunctions]]). Usable anywhere a generator column is legal:
  * `df.select($"doc_id", TextFunctions.wordNGrams($"text", 3).as("sh"))`.
  */
object TextFunctions {
  import org.apache.spark.sql.{Column, GraftColumnBridge}
  def wordNGrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordNGrams(GraftColumnBridge.expression(text), n))

  def kgramHashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      KGramHashes(GraftColumnBridge.expression(text), k))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))
}
