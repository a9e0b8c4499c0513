package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.7 — set operations.
  *
  * `union` is a zero-shuffle concat of partition lists; the distinct
  * variants (`distinct`/`intersect`/`except`) each cost one hash
  * shuffle on the full row — at 100 TB prefer pre-aggregated keys (as
  * here: we distinct 8-byte keys, not whole rows).
  */
object SetOps extends QueryPack {

  private def keys1995(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .where(year($"o_orderdate") === 1995).select($"o_custkey")
  }
  private def keys1996(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .where(year($"o_orderdate") === 1996).select($"o_custkey")
  }

  /** UNION ALL (bag) and UNION (distinct) over the same inputs. */
  def setUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = keys1995(s, dir).unionByName(keys1996(s, dir))
    val dis = all.distinct()
    all.groupBy($"o_custkey").agg(count(lit(1)).as("n_all"))
      .join(dis.withColumn("in_distinct", lit(true)), Seq("o_custkey"))
      .orderBy($"o_custkey")
  }

  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keys1995(s, dir).intersect(keys1996(s, dir)).orderBy($"o_custkey")
  }

  def setExcept(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keys1995(s, dir).except(keys1996(s, dir)).orderBy($"o_custkey")
  }

  /** INTERSECT ALL — bag semantics: a customer with 3 orders in 1995
    * and 2 in 1996 contributes min(3,2)=2 rows. A different physical
    * operator from the distinct variant: Spark plans both sides
    * through a counting aggregate + generate (no row-level dedup),
    * which is also the right 100 TB shape — multiplicities travel as
    * one (key, count) row per side, never as repeated rows. Output
    * aggregated back to (key, n) so the multiset is hash-comparable
    * with a deterministic total order. */
  def setIntersectAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keys1995(s, dir).intersectAll(keys1996(s, dir))
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .orderBy($"o_custkey")
  }

  /** EXCEPT ALL — bag difference: 3 orders in 1995 minus 2 in 1996
    * leaves 1 row (vs distinct EXCEPT's all-or-nothing). Same
    * counting-aggregate physical shape as [[setIntersectAll]]. */
  def setExceptAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    keys1995(s, dir).exceptAll(keys1996(s, dir))
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
      .orderBy($"o_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union" -> (setUnion _),
    "set_intersect" -> (setIntersect _),
    "set_except" -> (setExcept _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_except_all" -> (setExceptAll _))

  private val cte =
    """WITH k95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995),
      |     k96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996)""".stripMargin

  def oracle: Map[String, String] = Map(
    "set_union" ->
      s"""$cte,
        | uall AS (SELECT o_custkey FROM k95 UNION ALL SELECT o_custkey FROM k96),
        | dis AS (SELECT DISTINCT o_custkey, true AS in_distinct FROM uall)
        |SELECT u.o_custkey, count(*) AS n_all, any_value(d.in_distinct) AS in_distinct
        |FROM uall u JOIN dis d USING (o_custkey)
        |GROUP BY u.o_custkey ORDER BY u.o_custkey""".stripMargin,
    "set_intersect" ->
      s"""$cte
        |SELECT o_custkey FROM k95 INTERSECT SELECT o_custkey FROM k96
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      s"""$cte
        |SELECT o_custkey FROM k95 EXCEPT SELECT o_custkey FROM k96
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect_all" ->
      s"""$cte,
        | ia AS (SELECT o_custkey FROM k95
        |        INTERSECT ALL SELECT o_custkey FROM k96)
        |SELECT o_custkey, count(*) AS n FROM ia
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "set_except_all" ->
      s"""$cte,
        | ea AS (SELECT o_custkey FROM k95
        |        EXCEPT ALL SELECT o_custkey FROM k96)
        |SELECT o_custkey, count(*) AS n FROM ea
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
}
