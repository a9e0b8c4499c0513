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
}
