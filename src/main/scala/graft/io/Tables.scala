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

  /** `events.ts` has shipped in two parquet flavors across fixture
    * generations: TIMESTAMP(NANOS) — which Spark's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL) unless read as raw nanos via
    * `nanosAsLong` and truncated to microseconds — and plain
    * TIMESTAMP(MICROS). Adapt on the observed footer type: a LongType
    * `ts` is raw nanos (integer `div` keeps the math exact; ns epochs
    * exceed 2^53, so a double division would corrupt low bits), a
    * timestamp `ts` is read natively. Both normalize to the
    * microsecond TIMESTAMP_NTZ the other fixture timestamps get
    * (isAdjustedToUTC=false footers; session tz is pinned UTC so the
    * NTZ cast is value-preserving either way). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ts =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      else col("ts").cast("timestamp_ntz")
    raw.withColumn("ts", ts)
  }
}
