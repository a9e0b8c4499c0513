package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries
  * scale are locked in here, so a regression (lost pushdown, dropped
  * broadcast, single-phase agg) fails CI instead of surfacing as a
  * 100× slowdown on a real cluster. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  // formatted mode: toString truncates long PushedFilters/ReadSchema lists
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkSpec.sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("join_broadcast builds broadcast hash joins, never shuffles the fact side") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("scan_pruned pushes predicate and projection into the parquet scan") {
    val p = plan("scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)"), p)
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    // pruned read schema: exactly the 5 referenced columns, not all 11
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("agg_hash aggregates in two phases (partial map-side, final after shuffle)") {
    val p = plan("agg_hash")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
    assert(p.contains("partial_"), p.take(800))
  }

  test("topk plans TakeOrderedAndProject, not a global sort") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("join_theta broadcasts the provably-small filtered side") {
    val p = plan("join_theta")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  // A Window with an empty partition spec plans a SinglePartition
  // exchange — every row through one task. Allowed only above an
  // Aggregate (input bounded by the group-key domain, not the data).
  private def assertNoGlobalWindowOverRawData(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, SparkSpec.sfDir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
    val plan = df.queryExecution.optimizedPlan
    def hasAggBelow(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAggBelow)
    val offenders = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
    }
    assert(offenders.isEmpty,
      s"$name has a global window over unaggregated data:\n${offenders.mkString("\n")}")
  }

  test("win_frame_range never windows the raw data in a single partition") {
    assertNoGlobalWindowOverRawData("win_frame_range")
  }

  test("win_ntile_cumdist never windows the raw data in a single partition") {
    assertNoGlobalWindowOverRawData("win_ntile_cumdist")
  }
}
