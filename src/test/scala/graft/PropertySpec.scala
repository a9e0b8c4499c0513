package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws over generated data (SURVEY.md §5.3). Plain
  * ScalaCheck generators driven from a fixed seed (no scalatestplus
  * bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session

  private val rowsGen = Gen.listOfN(50,
    Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100.0, 100.0)))

  private def samples(n: Int): Seq[List[(Long, Double)]] =
    (1 to n).flatMap { i =>
      rowsGen(Gen.Parameters.default, rng.Seed(42L + i))
    }

  test("filter commutes with projection") {
    import spark.implicits._
    for (data <- samples(5)) {
      val df = data.toDF("k", "v")
      val a = df.filter($"k" > 5).select($"k", ($"v" * 2).as("w"))
      val b = df.select($"k", ($"v" * 2).as("w")).filter($"k" > 5)
      assert(a.collect().map(_.toString).sorted.sameElements(
             b.collect().map(_.toString).sorted))
    }
  }

  test("union count is sum of counts; distinct is idempotent") {
    import spark.implicits._
    for (Seq(x, y) <- samples(6).grouped(2)) {
      val a = x.toDF("k", "v")
      val b = y.toDF("k", "v")
      assert(a.union(b).count() == a.count() + b.count())
      val d = a.dropDuplicates("k")
      assert(d.count() == d.dropDuplicates("k").count())
      assert(d.count() == x.map(_._1).distinct.size)
    }
  }

  test("row_number is dense within partitions and starts at 1") {
    import spark.implicits._
    for (data <- samples(3) if data.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"v", monotonically_increasing_id())
      val ranks = data.toDF("k", "v")
        .select($"k", row_number().over(w).as("rn"))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).values
      ranks.foreach { rs =>
        val sorted = rs.map(_._2).toList.sorted
        assert(sorted == (1 to sorted.size).toList)
      }
    }
  }
}
