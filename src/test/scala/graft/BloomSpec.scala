package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomFilters.{bloomAgg, bloomMightContain}

/** Semantics of the explicit bloom semi-join reduction
  * (graft.functions.BloomFilters + Joins.joinBloomPrefilter). */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("no false negatives: every inserted key answers true") {
    val keys = spark.range(0, 1000).toDF("k")
    val bf = keys.agg(bloomAgg($"k", 1000L, 0.03).as("bf"))
    val misses = keys.crossJoin(bf)
      .where(!bloomMightContain($"bf", $"k"))
      .count()
    assert(misses == 0L)
  }

  test("false positive rate is near the configured fpp") {
    val bf = spark.range(0, 10000).toDF("k")
      .agg(bloomAgg($"k", 10000L, 0.01).as("bf"))
    // probe 10k keys that were never inserted
    val fp = spark.range(1000000, 1010000).toDF("k")
      .crossJoin(bf)
      .where(bloomMightContain($"bf", $"k"))
      .count()
    assert(fp < 500L, s"fpp=0.01 but $fp/10000 phantom hits") // 5× slack
  }

  test("filter bits are independent of partitioning / merge order") {
    def bits(parts: Int): Array[Byte] =
      spark.range(0, 5000).toDF("k").repartition(parts)
        .agg(bloomAgg($"k", 5000L, 0.02).as("bf"))
        .head().getAs[Array[Byte]](0)
    val ref = bits(1)
    for (p <- Seq(3, 7, 32))
      assert(java.util.Arrays.equals(bits(p), ref), s"parts=$p")
  }

  test("prefilter + exact join equals the plain join at sf0.001") {
    val got = ops.Joins.joinBloomPrefilter(spark, SparkSpec.sfDir).collect()
    val plain = {
      val build = io.Tables.t(spark, SparkSpec.sfDir, "customer")
        .where($"c_mktsegment" === "BUILDING")
        .select($"c_custkey", $"c_name")
      io.Tables.t(spark, SparkSpec.sfDir, "orders")
        .join(build, $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(count(lit(1)).as("n_orders"),
             graft.util.Det.sumMoney($"o_totalprice").as("spend"))
        .orderBy($"c_custkey")
        .collect()
    }
    assert(got.toSeq == plain.toSeq)
  }

  test("bloom_agg rejects non-bigint keys with a naming message") {
    val err = intercept[AnalysisException] {
      Seq("a", "b").toDF("k").agg(bloomAgg($"k", 10L, 0.1)).collect()
    }
    assert(err.getMessage.contains("BIGINT"))
  }
}
