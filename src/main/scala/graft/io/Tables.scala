package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet fixtures (`TESTDATA.md`,
  * `FIXTURES.md`). The reference repo's `repository/` layer was never
  * implemented (`/root/reference/src/etl/` is empty — SURVEY.md §0.2);
  * this is its Spark-native equivalent: schema-on-read from parquet
  * footers, vectorized scan, pushdown-friendly.
  *
  * At 100 TB these would be partitioned/bucketed table roots instead of
  * single files; the API shape (name → DataFrame) is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from `dir` (e.g. /root/testdata/sf0.01). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * (`nanosAsLong`) and truncate to a microsecond TIMESTAMP_NTZ —
    * matching both DuckDB's ns→µs truncation and the NTZ flavor the
    * other fixture timestamps get (isAdjustedToUTC=false footers).
    * Integer `div` keeps the math exact (ns epochs exceed 2^53, so a
    * double division would corrupt low bits).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
}
