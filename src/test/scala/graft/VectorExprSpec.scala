package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFunctions.{cosineSim, dotProduct, l2Norm}

/** Native codegen vector expressions must agree bitwise with the
  * higher-order-function formulation they replaced (same accumulation
  * order), and handle the null/mismatch edge cases the same way. */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)")
  private def hofNorm(c: String) = expr(
    s"sqrt(aggregate($c, 0.0D, (acc, x) -> acc + x * x))")

  private def pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
    (Seq(1e-9, 1e9, -1e-9), Seq(1e9, 1e-9, 1e9))
  ).toDF("a", "b")

  test("dot_product matches HOF formulation bitwise") {
    val rows = pairs
      .select(dotProduct($"a", $"b").as("native"), hofDot.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("int_dot equals the HOF integer fold and handles null/mismatch") {
    import graft.functions.VecFunctions.intDot
    val ip = Seq(
      (Seq(1, 2, 3), Seq(4, 5, 6)),
      (Seq(-127, 127, 0), Seq(127, -127, 64)),
      (Seq(Int.MaxValue, 1), Seq(2, 1))   // per-term long widening
    ).toDF("a", "b")
    val rows = ip.select(intDot($"a", $"b").as("native"), expr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS BIGINT) * y), 0L, (acc, v) -> acc + v)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // length mismatch and null array => null
    val edge = Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
      .select(intDot($"a", $"b")).collect()
    assert(edge.head.isNullAt(0))
    val nullArr = spark.sql(
      "SELECT CAST(NULL AS ARRAY<INT>) AS a, array(1, 2) AS b")
    assert(nullArr.select(intDot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("long_dot / long_sqdist equal the HOF integer folds and handle null/mismatch") {
    import graft.functions.VecFunctions.{longDot, longSqDist}
    val ip = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-1000000L, 1000000L, 0L), Seq(999999L, -999999L, 123456L)),
      (Seq(3999999L, -3999999L), Seq(-3999999L, 3999999L)) // grid-diff extreme
    ).toDF("a", "b")
    val rows = ip.select(
      longDot($"a", $"b").as("nd"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hd"),
      longSqDist($"a", $"b").as("ns"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("hs"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "long_dot != HOF")
      assert(r.getLong(2) == r.getLong(3), "long_sqdist != HOF")
    }
    val edge = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(longDot($"a", $"b"), longSqDist($"a", $"b")).collect()
    assert(edge.head.isNullAt(0) && edge.head.isNullAt(1))
    val nullArr = spark.sql(
      "SELECT CAST(NULL AS ARRAY<BIGINT>) AS a, array(1L, 2L) AS b")
    assert(nullArr.select(longDot(col("a"), col("b"))).collect().head.isNullAt(0))
    assert(nullArr.select(longSqDist(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("l2_norm and cosine_sim match HOF formulation bitwise") {
    val rows = pairs
      .select(l2Norm($"a").as("nn"), hofNorm("a").as("hn"),
        cosineSim($"a", $"b").as("nc"),
        (hofDot / (hofNorm("a") * hofNorm("b"))).as("hc"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("float arrays: computed in double, matches cast-then-HOF") {
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id", $"embedding".as("raw"),
        $"embedding".cast("array<double>").as("a"))
      .limit(50)
    val rows = e.select(
      l2Norm($"raw").as("n_native"), hofNorm("a").as("n_hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array, null element, length mismatch => null") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0), Some(2.0)))),                  // null array
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))), // null elem
      (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0))))  // len mismatch
    ).toDF("a", "b")
    val got = df.select(dotProduct($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(11.0), None, None, None))
    val cs = df.select(cosineSim($"a", $"b")).collect().map(_.isNullAt(0))
    assert(cs.toSeq == Seq(false, true, true, true))
  }

  test("zero-norm vector => null cosine") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(cosineSim($"a", $"b")).head().isNullAt(0))
  }

  test("SQL registration via GraftExtensions") {
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "l2_norm(array(3.0D, 4.0D)) AS n, " +
      "round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c").head()
    assert(got.getDouble(0) == 11.0)
    assert(got.getDouble(1) == 5.0)
    assert(got.getDouble(2) == 1.0)
  }

  test("interpreted eval agrees with codegen") {
    // force interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = Literal.create(Array(1.0, 2.0, 3.0))
    val b = Literal.create(Array(4.0, 5.0, 6.0))
    val d = graft.functions.DotProduct(a, b).eval(null)
    assert(d == 32.0)
    val c = graft.functions.CosineSim(a, b).eval(null).asInstanceOf[Double]
    val expect = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(c == expect)
    assert(graft.functions.L2Norm(a).eval(null) == math.sqrt(14.0))
    val ia = Literal.create(Array(1, 2, 3))
    val ib = Literal.create(Array(4, 5, 6))
    assert(graft.functions.IntDotProduct(ia, ib).eval(null) == 32L)
  }
}
