package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline

/** The pipeline layer must compose into ONE logical plan that Catalyst
  * optimizes across stage boundaries. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("stages compose in order") {
    val pipe = Pipeline(
      "double" -> (_.withColumn("x", $"x" * 2)),
      "inc"    -> (_.withColumn("x", $"x" + 1)))
    val out = pipe(Seq(1, 2, 3).toDF("x")).as[Int].collect().sorted
    assert(out.toSeq == Seq(3, 5, 7)) // (x*2)+1, not (x+1)*2
    assert(pipe.names == Seq("double", "inc"))
    val extended = pipe.andThen("neg")(_.withColumn("x", -$"x"))
    assert(extended(Seq(1).toDF("x")).as[Int].head() == -3)
  }

  test("a late-stage filter pushes down through earlier stages to the scan") {
    val pipe = Pipeline(
      "project" -> (_.select($"l_orderkey", $"l_quantity", $"l_returnflag")),
      "compute" -> (_.withColumn("q2", $"l_quantity" * 2)),
      "filter"  -> (_.where($"l_returnflag" === "R")))
    val df = pipe(graft.io.Tables.t(spark, SparkSpec.sfDir, "lineitem"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    // the stage-3 predicate must appear as a parquet pushed filter on
    // the stage-1 scan — proof the stage boundaries cost nothing
    assert(scan.contains("EqualTo(l_returnflag,R)"), scan.take(800))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_returnflag:string>"),
      scan.take(800))
  }
}
