package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: run one named query (or several) with timing and print its
  * formatted physical plan. Usage:
  *   runMain graft.tools.Explain <sfDir> <name> [name...]
  * Plan audit loop for SURVEY.md's scale posture: check broadcasts,
  * pushed filters, ReadSchema pruning, and WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = graft.config.Sessions.local()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm: trigger JIT/codegen + file listing so timing isolates the query
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      fn(spark, sfDir).count()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(s"=== $name rows=$n cold=${f"$t1%.2f"}s warm=${f"$t3%.2f"}s")
      if (sys.env.get("GRAFT_EXPLAIN").forall(_ == "1"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
