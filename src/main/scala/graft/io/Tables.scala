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
    spark.read.parquet(s"$dir/$name.parquet")
}
