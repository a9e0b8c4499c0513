package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.2 — projection expressions, predicates, null semantics.
  *
  * Per-row double arithmetic (no aggregation) is IEEE-deterministic and
  * bit-identical across engines, so raw products are emitted unrounded.
  * All predicates are Catalyst-pushable (no UDFs in the filter path).
  */
object Filters extends QueryPack {

  /** Arithmetic projection: revenue / charge per lineitem row. */
  def projectExpr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("charge"),
        ($"l_quantity" * $"l_extendedprice").as("gross"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Conjunctive + disjunctive predicates: date range, IN-list, LIKE. */
  def filterPred(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .where($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
             $"o_orderdate" < lit("1998-01-01").cast("timestamp") &&
             ($"o_orderstatus".isin("F", "P") ||
              $"o_totalprice" > 400000.0) &&
             $"o_orderpriority".like("%URGENT%"))
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** Null semantics: IS [NOT] NULL and null-safe equality (<=>). */
  def filterNull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .withColumn("st_np", nullif($"o_orderstatus", lit("P")))
      .withColumn("st_nf", nullif($"o_orderstatus", lit("F")))
    o.select(
        $"o_orderkey",
        $"st_np",
        $"st_np".isNull.as("is_null"),
        $"st_nf".isNotNull.as("is_not_null"),
        ($"st_np" <=> $"st_nf").as("null_safe_eq"))
      .where($"st_np".isNull || $"st_np" === "O")
      .orderBy($"o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project_expr" -> (projectExpr _),
    "filter_pred" -> (filterPred _),
    "filter_null" -> (filterNull _))

  def oracle: Map[String, String] = Map(
    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice*(1.0-l_discount) AS revenue,
        |  l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS charge,
        |  l_quantity*l_extendedprice AS gross
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND (o_orderstatus IN ('F','P') OR o_totalprice > 400000.0)
        |  AND o_orderpriority LIKE '%URGENT%'
        |ORDER BY o_orderkey""".stripMargin,
    "filter_null" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'P') AS st_np,
        |  nullif(o_orderstatus, 'P') IS NULL AS is_null,
        |  nullif(o_orderstatus, 'F') IS NOT NULL AS is_not_null,
        |  nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM nullif(o_orderstatus, 'F') AS null_safe_eq
        |FROM orders
        |WHERE nullif(o_orderstatus, 'P') IS NULL OR nullif(o_orderstatus, 'P') = 'O'
        |ORDER BY o_orderkey""".stripMargin)
}
