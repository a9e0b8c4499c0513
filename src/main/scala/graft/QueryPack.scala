package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One category of the SURVEY.md §2 operator inventory.
  *
  * Each pack contributes named queries (driver-run via `Verify`/`Bench`)
  * and, where SQL-expressible, a DuckDB oracle per query. Contract rules
  * (SURVEY.md §5.1): every query imposes a deterministic total ORDER BY
  * matching its oracle's, aliases every computed column identically on
  * both sides, and uses `graft.util.Det` for float aggregates.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable ANSI SQL per query name; omit keys for
    * non-SQL-expressible ops (driver falls back to rows-only check). */
  def oracle: Map[String, String]
}
