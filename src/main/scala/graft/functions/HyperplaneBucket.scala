package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signed-random-projection LSH bucket id: bit p of the result is
  * sign(<v, h_p>) for `nBits` pseudo-random hyperplanes h_p, whose
  * components are derived deterministically from (seed, p, d) via a
  * splitmix64 finalizer — no RNG state, identical on every executor,
  * reproducible across runs (the property the HOF formulation bought
  * with xxhash64, here precomputed ONCE per expression instead of
  * per row·plane·dim).
  *
  * Vectors whose cosine is high land in the same bucket with
  * probability (1 - θ/π)^nBits, so candidate generation becomes an
  * equi-join on the bucket id — the shuffle keys on bucket and the
  * crossJoin disappears, which is the only formulation that survives
  * a 1000× corpus.
  */
case class HyperplaneBucket(child: Expression, nBits: Int, dim: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecExpr.checkArray("hyperplane_bucket", child)
  override def prettyName: String = "hyperplane_bucket"

  private lazy val et = VecExpr.elemType(child)

  /** coefs(p * dim + d) = component d of hyperplane p. */
  @transient lazy val coefs: Array[Double] = HyperplaneBucket.coefs(nBits, dim, seed)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return null
    val acc = new Array[Double](nBits)
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      val x = VecExpr.read(arr, et, d)
      var p = 0
      while (p < nBits) { acc(p) += x * coefs(p * dim + d); p += 1 }
      d += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) { if (acc(p) >= 0.0) bucket |= (1L << p); p += 1 }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coefRef = ctx.addReferenceObj("hyperplaneCoefs", coefs, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $acc = new double[$nBits];
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    final double $x = ${VecExpr.genRead(a, et, d)};
         |    for (int $p = 0; $p < $nBits; $p++) {
         |      $acc[$p] += $x * $coefRef[$p * $dim + $d];
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    long $bucket = 0L;
         |    for (int $p = 0; $p < $nBits; $p++) {
         |      if ($acc[$p] >= 0.0) $bucket |= (1L << $p);
         |    }
         |    ${ev.value} = $bucket;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def bucket(c: Column, nBits: Int, dim: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      HyperplaneBucket(GraftColumnBridge.expression(c), nBits, dim, seed))

  // splitmix64 finalizer (public-domain constants) -> uniform [-0.5, 0.5)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The hyperplane coefficient table: component d of hyperplane p at
    * index p·dim + d. On the COMPANION (not the expression instance)
    * because the oracle twins embed the same table as SQL literals —
    * the coefficients are data-independent query parameters (like a
    * damping factor), so interpolating them keeps the wrapping-64-bit
    * splitmix64 derivation out of DuckDB, where checked BIGINT/int128
    * arithmetic cannot express it. Doubles round-trip through
    * Double.toString, so the literal parse is bit-exact. */
  def coefs(nBits: Int, dim: Int, seed: Long): Array[Double] = {
    val a = new Array[Double](nBits * dim)
    var p = 0
    while (p < nBits) {
      var d = 0
      while (d < dim) {
        val h = mix(seed * 0x100000001b3L + p * 1000003L + d)
        a(p * dim + d) = ((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5
        d += 1
      }
      p += 1
    }
    a
  }
}
