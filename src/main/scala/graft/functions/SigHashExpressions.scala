package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The [[graft.util.SigHash]] family as tight Java-callable kernels —
  * kept OUTSIDE the expressions so interpreted eval and codegen run
  * the exact same bytes (the KGramHashesUtil pattern). These exist for
  * PERFORMANCE ONLY: the round-14 re-seed first spelled the MinHash /
  * SimHash signatures as SQL HOF folds (one interpreted lambda frame
  * per character per shingle per doc), which measured 50–150× the
  * xxhash64 natives they replaced (dedup_near 0.24 s → 34 s at sf0.1).
  * Each kernel computes value-for-value what its HOF spelling (and the
  * DuckDB list_reduce twin) computes — pinned in SigHashSpec — so the
  * oracle differential is unaffected by which side evaluates natively.
  */
object SigHashUtil {
  import graft.util.SigHash.{A, B, P}

  /** Polynomial code-point hash — exactly
    * `aggregate(filter(split(s,''), c != ''), 0L,
    *   (acc,c) -> (acc*31 + ascii(c)) % P)`:
    * split('') emits one string per CODE POINT (Java regex splits are
    * code-point aware) and ascii() returns the code point, so the fold
    * domain is code points; the empty string folds to 0. */
  def polyStr(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** g_k(h) — [[graft.util.SigHash.mix]] verbatim: every intermediate
    * is non-negative and ≤ (P−1)² + P < 2⁶³. */
  def mix(h: Long, k: Long): Long =
    (((1L + k * A) % P) * h + (k * B) % P) % P

  /** MinHash signature — exactly
    * `transform(sequence(1, n), k -> array_min(transform(hs, mix)))`
    * over `hs = transform(shingles, polyStr)`: one base hash per
    * shingle, then n affine-mix minima. Null shingle elements are
    * skipped (array_min ignores nulls); an empty/all-null shingle list
    * yields null elements (array_min of nothing is null). */
  def minhashSig(shingles: ArrayData, nHashes: Int): ArrayData = {
    val nSh = shingles.numElements()
    val hs = new Array[Long](nSh)
    var nValid = 0
    var i = 0
    while (i < nSh) {
      if (!shingles.isNullAt(i)) {
        hs(nValid) = polyStr(shingles.getUTF8String(i))
        nValid += 1
      }
      i += 1
    }
    val out = new Array[Any](nHashes)
    var k = 1
    while (k <= nHashes) {
      if (nValid == 0) out(k - 1) = null
      else {
        val a = (1L + k * A) % P
        val b = (k.toLong * B) % P
        var mn = Long.MaxValue
        i = 0
        while (i < nValid) {
          val g = (a * hs(i) + b) % P
          if (g < mn) mn = g
          i += 1
        }
        out(k - 1) = mn
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash — exactly the HOF vote fold over
    * `ths = transform(toks, polyStr)` with per-bit parity draws
    * `mix(h, b + 101) % 2` (seed offset 101 decorrelates from the
    * MinHash seeds 1–16) and bit b set when votes are strictly
    * positive; a null token votes −1 on every bit (the SQL CASE's
    * ELSE branch on a null condition) and an empty token list returns
    * 0 (all votes zero, no bit strictly positive). */
  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val h = polyStr(toks.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (mix(h, b + 101L) % 2 == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** `minhash_sig(shingles, n)` — native twin of the SQL HOF spelling
  * (see [[SigHashUtil.minhashSig]]); DataFrame surface
  * `TextFunctions.minhashSig`. */
case class MinhashSig(child: Expression, nHashes: Int) extends UnaryExpression {

  require(nHashes >= 1, s"minhash_sig: nHashes must be >= 1, got $nHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SigHashUtil.minhashSig(input.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SigHashUtil.minhashSig($c, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `simhash64(toks)` — native twin of the SQL vote fold (see
  * [[SigHashUtil.simhash64]]); DataFrame surface
  * `TextFunctions.simhash64`. */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SigHashUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SigHashUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object SigHashFunctions {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  def minhashSig(shingles: Column, nHashes: Int): Column =
    GraftColumnBridge.column(MinhashSig(e(shingles), nHashes))
  def simhash64(toks: Column): Column =
    GraftColumnBridge.column(Simhash64(e(toks)))
}
