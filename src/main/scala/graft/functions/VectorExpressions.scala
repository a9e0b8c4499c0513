package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY.md
  * §2.10). The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x, y) -> x * y), 0D, acc + x)`) runs
  * interpreted per element and boxes every Double — per-pair cost that
  * dominated the LSH/near-dup joins. These compile to a tight primitive
  * loop over `ArrayData` inside whole-stage codegen: no boxing, no
  * closure dispatch, no Double allocation.
  *
  * Semantics (kept identical to the HOF formulation so results and
  * DuckDB oracles are unchanged):
  *  - element types float or double; math always in double (exact
  *    widening, same value as cast-then-sum)
  *  - summation in index order (same float-addition order as the HOF
  *    and DuckDB's list_* functions — bitwise-stable results)
  *  - null array, length mismatch, or null element => null
  *  - CosineSim: zero-norm side => null (HOF division gives NaN;
  *    callers always filter cos to a finite threshold, and fixtures
  *    contain no zero vectors)
  */
private[graft] object VecExpr {
  def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  def checkArray(name: String, es: Expression*): TypeCheckResult = {
    val bad = es.filterNot(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => false
      case _ => true
    })
    val ok = es.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double> arguments, got " +
        es.map(_.dataType.simpleString).mkString(", "))
  }

  def read(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  def genRead(arr: String, et: DataType, i: String): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
}

/** dot(a, b) = Σ a_i * b_i over array<float|double>. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  import VecExpr._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkArray("dot_product", left, right)
  override def prettyName: String = "dot_product"

  private lazy val (lt, rt) = (elemType(left), elemType(right))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += read(a, lt, i) * read(b, rt, i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${genRead(a, lt, i)} * ${genRead(b, rt, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** int_dot(a, b) = Σ (long) a_i * b_i over array<int> — the scoring
  * kernel for the int8-quantized vector table (sim_search_quant).
  * Integer math is exact and order-free, so this is bit-identical to
  * the HOF `aggregate(zip_with(...))` it replaces — but the HOF runs
  * interpreted with per-element boxing, while this stays a primitive
  * loop inside whole-stage codegen. Overflow envelope: each product is
  * at most 2⁶² in magnitude, so the long accumulator is EXACT for
  * |a_i|,|b_i| ≤ 2³¹⁻ᵏ/√d... concretely, safe whenever
  * d · max|a_i| · max|b_i| < 2⁶³ — int8 codes (|x| ≤ 127) are exact to
  * d ≈ 5.7e14, and |x| ≤ 2¹⁵ is exact to d = 4096. Full-range int32
  * inputs can WRAP (one product alone reaches ~4.6e18); don't use
  * int_dot for those without a wider accumulator. */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot expects array<int> arguments, got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }
  override def prettyName: String = "int_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (long) $a.getInt($i) * $b.getInt($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

/** l2_norm(a) = sqrt(Σ a_i²). */
case class L2Norm(child: Expression) extends UnaryExpression {
  import VecExpr._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkArray("l2_norm", child)
  override def prettyName: String = "l2_norm"

  private lazy val et = elemType(child)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = read(a, et, i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = ${genRead(a, et, i)};
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** cosine_sim(a, b) = dot(a,b) / (|a|·|b|), single pass over both
  * arrays. Matches `dot / (sqrt(Σa²) * sqrt(Σb²))` with the same
  * accumulation order as the per-column formulation. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  import VecExpr._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkArray("cosine_sim", left, right)
  override def prettyName: String = "cosine_sim"

  private lazy val (lt, rt) = (elemType(left), elemType(right))

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = read(a, lt, i)
      val y = read(b, rt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${genRead(a, lt, i)};
         |    final double $y = ${genRead(b, rt, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** long_dot(a, b) = Σ a_i * b_i over array<bigint> — the exact-integer
  * scoring kernel for the 1e-6 grid family (gridLloyd's cosines and
  * the SemDeDup in-cell pair rule). Bit-identical to the HOF
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, ...)` it replaces
  * (integer sums are order-free), but a primitive loop inside
  * whole-stage codegen instead of per-element boxed lambda frames.
  * Overflow envelope: exact whenever d · max|a_i| · max|b_i| < 2⁶³ —
  * grid coordinates of unit-norm vectors (|g| ≤ 1e6, d = 64) sit at
  * 6.4e13, nine orders inside. Mirrors [[IntDotProduct]]. */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot expects array<bigint> arguments, got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }
  override def prettyName: String = "long_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** long_sqdist(a, b) = Σ (a_i - b_i)² over array<bigint> — the
  * Lloyd's-assignment distance kernel of the grid k-means family.
  * Bit-identical to `aggregate(zip_with(a, b, (x, y) ->
  * (x - y) * (x - y)), 0L, ...)`; same overflow envelope as
  * [[LongDotProduct]] (diffs of 1e6-grid coordinates ≤ ~4e6, squared
  * ×64 dims ≪ 2⁶³). This loop runs n·k times per Lloyd's pass — the
  * single hottest expression in the k-means queries. */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_sqdist expects array<bigint> arguments, got " +
        Seq(left, right).map(_.dataType.simpleString).mkString(", "))
  }
  override def prettyName: String = "long_sqdist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points (no session registration needed). */
object VecFunctions {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(e(a), e(b)))
  def intDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntDotProduct(e(a), e(b)))
  def longDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongDotProduct(e(a), e(b)))
  def longSqDist(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongSqDist(e(a), e(b)))
  def l2Norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(e(a)))
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(e(a), e(b)))
}
