package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t
import graft.util.Det._

/** SURVEY.md §2.4 — aggregation operators.
  *
  * All hash aggregates: Catalyst plans a partial (map-side combine) +
  * final `HashAggregateExec` pair, so at 100 TB each executor pre-folds
  * its partitions and only |groups| × |partitions| rows shuffle. Group
  * cardinalities here (flag×status=6, nation=25, brand≈25) are tiny, so
  * the shuffle is negligible at any scale.
  */
object Aggregates extends QueryPack {

  /** TPC-H Q1 shape: scan-heavy, 6 output groups. The flagship query. */
  def aggHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .where($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumMoney($"l_quantity").as("sum_qty"),
        sumMoney($"l_extendedprice").as("sum_base_price"),
        sumMoney($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        sumMoney($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        avgMoney($"l_quantity").as("avg_qty"),
        avgMoney($"l_extendedprice").as("avg_price"),
        avgMoney($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val aggHashSql: String = {
    val disc = "l_extendedprice*(1.0-l_discount)"
    val charge = s"$disc*(1.0+l_tax)"
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSumMoney("l_quantity")} AS sum_qty,
       |  ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
       |  ${sqlSumMoney(disc)} AS sum_disc_price,
       |  ${sqlSumMoney(charge)} AS sum_charge,
       |  ${sqlAvgMoney("l_quantity")} AS avg_qty,
       |  ${sqlAvgMoney("l_extendedprice")} AS avg_price,
       |  ${sqlAvgMoney("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_hash" -> (aggHash _))

  def oracle: Map[String, String] = Map(
    "agg_hash" -> aggHashSql)
}
