package graft

import org.scalatest.funsuite.AnyFunSuite

/** Codegen-vs-interpreted parity for every custom expression with a
  * real `doGenCode` (the custom-Expression bug class: eval() and the
  * generated Java silently disagree and only one path ever runs in
  * production). WordNGrams and the vector expressions already carry
  * parity cases in their own specs; this spec closes the remaining
  * three (KGramHashes, WinnowFingerprints, HyperplaneBucket) by
  * running the SAME query once under default codegen and once with
  * whole-stage codegen off AND the expression factory forced to
  * NO_CODEGEN (interpreted eval), asserting identical results on the
  * real fixture. */
class ExprParitySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def bothPaths[T](run: () => T): (T, T) = {
    val withCodegen = run()
    val ws = "spark.sql.codegen.wholeStage"
    val fm = "spark.sql.codegen.factoryMode"
    val prevWs = spark.conf.get(ws)
    val prevFm = spark.conf.getOption(fm)
    spark.conf.set(ws, "false")
    spark.conf.set(fm, "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set(ws, prevWs)
        prevFm match {
          case Some(v) => spark.conf.set(fm, v)
          case None    => spark.conf.unset(fm)
        }
      }
    (withCodegen, interpreted)
  }

  test("KGramHashes: codegen == interpreted on fixture text") {
    def run() = graft.io.Tables.t(spark, SparkSpec.sfDir, "documents")
      .limit(60).select($"doc_id",
        graft.functions.TextFunctions.kgramHashes($"text", 7).as("h"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val (cg, interp) = bothPaths(run _)
    assert(cg.nonEmpty && cg.exists(_._2.nonEmpty))
    assert(cg.toSeq == interp.toSeq, "KGramHashes paths diverge")
  }

  test("WinnowFingerprints: codegen == interpreted on fixture text") {
    // a Generator: each doc explodes to one row per fingerprint
    def run() = graft.io.Tables.t(spark, SparkSpec.sfDir, "documents")
      .limit(60).select($"doc_id",
        graft.functions.TextFunctions.winnowFingerprints($"text", 5, 4).as("fp"))
      .as[(Long, Long)].collect().sorted
    val (cg, interp) = bothPaths(run _)
    assert(cg.nonEmpty)
    assert(cg.toSeq == interp.toSeq, "WinnowFingerprints paths diverge")
  }

  test("DotProduct/CosineSim: codegen == interpreted on fixture embeddings") {
    // VectorExprSpec pins both paths against hand-computed 3-element
    // truths; this runs them at fixture width (64 dims) where a codegen
    // loop-bound or accumulator-type bug would actually show
    def run() = {
      val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
        .limit(40).select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val q = e.select($"vec_id", $"v").limit(1)
        .select($"v".as("q")).crossJoin(e)
      q.select($"vec_id",
          graft.functions.VecFunctions.dotProduct($"q", $"v").as("d"),
          graft.functions.VecFunctions.cosineSim($"q", $"v").as("c"))
        .as[(Long, Double, Double)].collect().sortBy(_._1)
    }
    val (cg, interp) = bothPaths(run _)
    assert(cg.length == 40)
    cg.zip(interp).foreach { case ((i1, d1, c1), (i2, d2, c2)) =>
      assert(i1 == i2)
      assert(java.lang.Double.doubleToLongBits(d1) ==
             java.lang.Double.doubleToLongBits(d2), s"dot diverges at $i1")
      assert(java.lang.Double.doubleToLongBits(c1) ==
             java.lang.Double.doubleToLongBits(c2), s"cosine diverges at $i1")
    }
  }

  test("HyperplaneBucket: codegen == interpreted on fixture embeddings") {
    def run() = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .limit(80).select($"vec_id",
        graft.functions.HyperplaneBucket.bucket($"embedding", 12).as("b"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val (cg, interp) = bothPaths(run _)
    assert(cg.nonEmpty)
    assert(cg.map(_._2).distinct.length > 1, "degenerate bucketing")
    assert(cg.toSeq == interp.toSeq, "HyperplaneBucket paths diverge")
  }
}
