package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.6 — global sort and top-k.
  *
  * `orderBy.limit(n)` is planned as `TakeOrderedAndProjectExec`: each
  * partition keeps a size-n heap and only n rows per partition reach
  * the driver — O(n) memory at any scale, no global shuffle-sort. The
  * full `sort_multi` is a range-partitioned global sort (sampled range
  * boundaries), the scalable pattern for ordered output at 100 TB.
  * Null ordering is explicit on both sides: Spark defaults nulls-first
  * for ASC while DuckDB defaults nulls-last.
  */
object Sorts extends QueryPack {

  /** Multi-key global sort: asc/desc mix + explicit null placement. */
  def sortMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .withColumn("seg_nb", nullif($"c_mktsegment", lit("BUILDING")))
      .select($"c_custkey", $"c_mktsegment", $"seg_nb", $"c_acctbal")
      .orderBy($"seg_nb".asc_nulls_first, $"c_acctbal".desc_nulls_last, $"c_custkey".asc)
  }

  /** Global top-100 orders by price → TakeOrderedAndProjectExec. */
  def topk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi" -> (sortMulti _),
    "topk" -> (topk _))

  def oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nb, c_acctbal
        |FROM customer
        |ORDER BY seg_nb ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC""".stripMargin,
    "topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)
}
