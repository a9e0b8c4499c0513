package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-input checks for the perceptual-hash tier (the fixture
  * corpus has no byte-near media by construction) and hand-built
  * distributions for the drift audit. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("phash: a one-byte edit stays within Hamming 3 of the original " +
       "and shares a band; an unrelated doc does neither") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    // flip one character mid-payload — a "re-encode"-sized perturbation
    val tweaked = base.updated(40, 'x')
    val other = "zulu yankee xray whiskey victor uniform tango sierra " +
      "romeo quebec papa oscar november mike lima kilo juliet india hotel"
    val out = graft.multimodal.Multimodal
      .multimodalPhash(spark, docsDir(Seq((1L, base), (2L, tweaked), (3L, other))))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)),
         Seq(r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))))
      .toMap
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val near = hamming(out(1L)._1, out(2L)._1)
    val far = hamming(out(1L)._1, out(3L)._1)
    assert(near <= 3, s"one-byte edit moved $near bits")
    assert(far > 10, s"unrelated doc only $far bits away")
    // pigeonhole: hamming <= 3 over 4 bands forces a shared band —
    // the equi-join key the pair-recovery tier would hit
    assert(out(1L)._2.zip(out(2L)._2).exists { case (x, y) => x == y },
      "near pair shares no band — banded recovery would miss it")
  }

  test("dq_drift: moved mass flags, identical distributions don't") {
    def ordersDir(h2Price: Double): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
      val h1 = (1L to 10L).map(i =>
        (i, java.sql.Timestamp.valueOf("1996-02-01 00:00:00"), 10000.0))
      val h2 = (11L to 20L).map(i =>
        (i, java.sql.Timestamp.valueOf("1996-08-01 00:00:00"), h2Price))
      (h1 ++ h2).toDF("o_orderkey", "o_orderdate", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")
      dir
    }
    val moved = graft.pipeline.Pipelines.dqDrift(spark, ordersDir(60000.0))
      .collect()
    // all H1 mass in bucket 0, all H2 in bucket 2: |dCDF| = 1 at the edge
    assert(moved.forall(_.getBoolean(4)), "full mass move must flag drift")
    assert(moved.filter(_.getLong(0) == 0L).head.getDouble(3) == 1.0)
    val same = graft.pipeline.Pipelines.dqDrift(spark, ordersDir(10000.0))
      .collect()
    assert(same.forall(!_.getBoolean(4)), "identical halves must not flag")
    assert(same.forall(_.getDouble(3) == 0.0))
  }
}
