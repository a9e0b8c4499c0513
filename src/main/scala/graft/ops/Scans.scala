package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.1 — scans with projection/predicate pushdown.
  *
  * At 100 TB the only scan that matters is the pruned one: Catalyst
  * pushes `where`/`select` into `FileSourceScanExec` so parquet skips
  * row groups via min/max stats and never materializes unused columns
  * (verify: `.explain` shows PushedFilters + narrowed ReadSchema).
  */
object Scans extends QueryPack {

  /** Full-fidelity scan, deterministically ordered by the composite PK. */
  def scanParquet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Projection + predicate that both reach the parquet reader. */
  def scanPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .where($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
             $"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet" -> (scanParquet _),
    "scan_pruned" -> (scanPruned _))

  def oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
