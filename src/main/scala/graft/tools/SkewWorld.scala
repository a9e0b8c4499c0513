package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew fixture generator (dev tool, not part of the query surface):
  * copies a driver-generated sf world with two planted heavy hitters —
  * the skew shapes that break naive plans at 100 TB:
  *
  *  - **boilerplate text**: a fixed 41-word paragraph appended to ~1 in
  *    3 documents (xxhash64-selected). Every pair of tagged docs now
  *    shares ~39 word-3-grams, so an UNCAPPED shingle self-join would
  *    materialize O((n/3)²) candidate pairs per hot shingle — the
  *    quadratic blowup the hot-shingle df-cap exists to prevent. The
  *    rate is chosen so the per-(source, shingle) doc frequency
  *    crosses the cap (50) from sf0.1 upward (~83/source there): on
  *    those worlds the cap is load-bearing, not latent — candidate
  *    generation must drop the boilerplate shingles or dedup_ngram
  *    (and everything riding it) goes quadratic.
  *  - **hot user**: ~1 in 5 events re-keyed to user 1, the classic
  *    power-law key for user-partitioned windows, sessionization and
  *    grouped top-k.
  *
  * Both plants are pure column arithmetic (same rows every run), so
  * the DuckDB differential runs on the identical world: the oracles
  * mirror the df-cap, which means correctness-under-cap is CHECKED
  * where the cap actually bites, not just where it is a no-op.
  *
  * Usage: runMain graft.tools.SkewWorld <srcSfDir> <dstDir>
  */
object SkewWorld {

  /** 41 words with no repeated 3-word run, so it contributes 39
    * distinct 3-gram shingles shared by every tagged doc. */
  val boilerplate: String =
    ("this document is provided for informational purposes only and " +
     "the authors make no representation or warranty of any kind " +
     "express or implied regarding accuracy completeness suitability " +
     "or availability please consult the official source before " +
     "acting on the contents hereof thank you")

  def write(spark: SparkSession, src: String, dst: String): Unit =
    NullWorld.tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = t match {
        case "documents" =>
          df.withColumn("text",
            when(pmod(xxhash64(col("doc_id")), lit(3)) === 0,
              concat(col("text"), lit(" " + boilerplate)))
              .otherwise(col("text")))
        case "events" =>
          df.withColumn("user_id",
            when(pmod(xxhash64(col("event_id")), lit(5)) === 0, lit(1L))
              .otherwise(col("user_id")))
        case _ => df
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val spark = graft.config.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    write(spark, args(0), args(1))
    spark.stop()
  }
}
