package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.3 and §7.
  *
  * The reference (`/root/reference/`, SURVEY.md §0) defines intent, not
  * code; the binding inventory is SURVEY.md §2. Each `QueryPack` below
  * implements one §2 category; this object is pure wiring.
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    ops.Scans, ops.Filters, ops.Scalars, ops.Sorts, ops.SetOps,
    ops.Aggregates, ops.Joins, ops.Windows, ops.StreamingBatch,
    ops.Udfs, text.TextOps, text.TextMetrics, text.Bpe, vec.VectorOps,
    multimodal.Multimodal,
    stream.Streams, io.Ingest, sql.SqlQueries, pipeline.Pipelines,
    model.Schemas)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregates.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val m = all.toMap
    // toMap silently keeps the LAST entry on key collision — a pack
    // accidentally reusing a name would shadow another pack's query
    // and the driver would verify the wrong plan under the right name
    require(m.size == all.size, "duplicate query names across packs: " +
      all.groupBy(_._1).filter(_._2.size > 1).keys.mkString(", "))
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
