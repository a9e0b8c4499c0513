package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run at sf0.001; the driver contract
  * additionally smoke-checks entry() for rows > 0. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, SparkSpec.sfDir).count()
      assert(n >= 0)
    }
  }
}
