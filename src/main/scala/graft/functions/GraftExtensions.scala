package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions so `spark.sql("... cosine_sim(a, b)")`
  * works. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (done by Verify/Bench/Explain and the test session).
  *
  * The DataFrame path (`VecFunctions`) does not require this — it binds
  * the expressions directly — so driver-owned sessions without the
  * config still run every query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, null, name, usage, "")

  /** `k` must resolve to an integral constant at registration time (the
    * aggregate's buffer is sized by it). Accept every integral literal
    * width, and — because injectFunction builders run at resolution
    * time, BEFORE ConstantFolding — also eval() any other foldable
    * expression (`CAST(5 AS BIGINT)`, `2+3`) so constant arithmetic a
    * user reasonably writes keeps working. Reject non-integral and
    * non-foldable k with a message naming the actual problem instead of
    * a bare ClassCastException. */
  private def literalK(e: Expression, fn: String = "topk_freq"): Int = {
    def integral(v: Any): Option[Int] = v match {
      case b: Byte  => Some(b.toInt)
      case s: Short => Some(s.toInt)
      case i: Int   => Some(i)
      case l: Long if l.isValidInt => Some(l.toInt)
      case l: Long =>
        throw new IllegalArgumentException(s"$fn: k=$l exceeds Int range")
      case _ => None
    }
    e match {
      case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
        integral(v).getOrElse(
          throw new IllegalArgumentException(s"$fn: k must not be NULL"))
      case other if other.foldable =>
        // eval() can itself throw under ANSI (e.g. `1 div 0` is
        // foldable); surface that as the same descriptive error class
        // instead of a raw Spark exception escaping registration
        val v =
          try other.eval()
          catch {
            case scala.util.control.NonFatal(err) =>
              throw new IllegalArgumentException(
                s"$fn: k failed to evaluate: " + err.getMessage, err)
          }
        if (v == null)
          throw new IllegalArgumentException(s"$fn: k must not be NULL")
        integral(v).getOrElse(
          throw new IllegalArgumentException(
            s"$fn: k must fold to an integral value, got type " +
              other.dataType.sql))
      case other =>
        throw new IllegalArgumentException(
          s"$fn: k must be a constant (foldable), got " + other.sql)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseCosineRule)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRule)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm of a float/double array"),
      (args: Seq[Expression]) => L2Norm(args.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      info("cms_estimate", "cms_estimate(sketch, item) - estimated count of item in a count_min_sketch binary"),
      (args: Seq[Expression]) => CmsEstimate(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("topk_freq"),
      info("topk_freq", "topk_freq(expr, k) - Misra-Gries heavy hitters per group"),
      (args: Seq[Expression]) => TopKFreq(args(0), literalK(args(1)))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - generator: sliding word n-grams over a space tokenization"),
      (args: Seq[Expression]) =>
        WordNGrams(args(0), literalK(args(1), "word_ngrams"))))
    ext.injectFunction((
      FunctionIdentifier("kgram_hashes"),
      info("kgram_hashes", "kgram_hashes(text, k) - rolling Karp-Rabin hash (base 31, mod 1e9+7) of every k-char-gram"),
      (args: Seq[Expression]) =>
        KGramHashes(args(0), literalK(args(1), "kgram_hashes"))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(text, k, w) - generator: distinct winnowing fingerprints (min rolling k-gram hash per window of w)"),
      (args: Seq[Expression]) =>
        WinnowFingerprints(args(0), literalK(args(1), "winnow_fingerprints"),
          literalK(args(2), "winnow_fingerprints"))))
    ext.injectFunction((
      FunctionIdentifier("bounded_topk"),
      info("bounded_topk", "bounded_topk(ord, id, k) - exact top-k (ord DESC, id ASC) per group in O(k) state"),
      (args: Seq[Expression]) =>
        // numeric SQL literals arrive as DECIMAL/INT; coerce like the
        // DataFrame surface does
        BoundedTopK(Cast(args(0), DoubleType), Cast(args(1), LongType),
          literalK(args(2), "bounded_topk"))))
  }
}
