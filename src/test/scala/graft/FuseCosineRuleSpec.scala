package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VecFunctions.{cosineSim, dotProduct, l2Norm}

/** The injected optimizer rule must fuse dot/(|a|·|b|) into CosineSim
  * without changing results. */
class FuseCosineRuleSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  // parquet-backed input: a literal LocalRelation would be evaluated
  // away by ConvertToLocalRelation before the plan can be inspected
  private def pairs = {
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("a"))
    val q = e.where($"vec_id" === 0)
      .select($"a".as("b"))
    e.where($"vec_id" < 20).crossJoin(q)
  }

  test("naive cosine form is rewritten to CosineSim") {
    val naive = pairs.select(
      (dotProduct($"a", $"b") / (l2Norm($"a") * l2Norm($"b"))).as("cos"))
    val opt = naive.queryExecution.optimizedPlan.toString
    assert(opt.contains("cosine_sim"), opt)
    assert(!opt.contains("dot_product"), opt)
  }

  test("commuted norm product also fuses") {
    val commuted = pairs.select(
      (dotProduct($"a", $"b") / (l2Norm($"b") * l2Norm($"a"))).as("cos"))
    assert(commuted.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
  }

  test("fused result equals direct CosineSim bitwise") {
    val naive = pairs
      .select((dotProduct($"a", $"b") / (l2Norm($"a") * l2Norm($"b"))).as("cos"))
      .collect().map(_.getDouble(0))
    val direct = pairs.select(cosineSim($"a", $"b").as("cos"))
      .collect().map(_.getDouble(0))
    assert(naive.sameElements(direct))
  }

  test("non-matching shapes are left alone") {
    val other = pairs.select(
      (dotProduct($"a", $"b") / (l2Norm($"a") * l2Norm($"a"))).as("x"))
    val opt = other.queryExecution.optimizedPlan.toString
    assert(opt.contains("dot_product"), opt)
  }

  test("zero-norm input: fused form yields NULL (the documented delta)") {
    // the scaladoc promises NULL where the unfused ANSI divide would
    // error — pin it so a CosineSim change can't silently turn the
    // undefined-similarity case into a crash or a NaN. Parquet-backed
    // for the same reason as `pairs`: on a LocalRelation the Divide is
    // constant-folded (and ANSI-errors) before the injected rule runs.
    val path = java.nio.file.Files
      .createTempDirectory("graft_fuse_zero").toString + "/t.parquet"
    // BOTH operands must be real columns: a foldable array literal's
    // l2_norm is constant-folded away, which (correctly) breaks the
    // fuse pattern and leaves the naive ANSI divide in place
    Seq((1L, Seq(0.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),
        (2L, Seq(1.0, 2.0, 2.0), Seq(1.0, 0.0, 0.0)))
      .toDF("id", "a", "b").write.mode("overwrite").parquet(path)
    val zero = spark.read.parquet(path)
    val rows = zero
      .select($"id", (dotProduct($"a", $"b") / (l2Norm($"a") * l2Norm($"b"))).as("cos"))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).isNullAt(1), "zero-norm row must be NULL, not error/NaN")
    assert(!rows(1).isNullAt(1) && !rows(1).getDouble(1).isNaN)
  }
}
