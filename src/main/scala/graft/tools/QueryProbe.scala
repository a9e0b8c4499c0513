package graft.tools

/** Isolated-warm single-query prober (dev tool, not part of the query
  * surface): the measurement protocol every round's contention
  * adjudication and scale re-probe has re-implemented ad hoc, as a
  * permanent main. Runs in a FRESH JVM (use tools/run_main.sh so no
  * sbt/test neighbors share the box), absorbs one-time session costs
  * against an untimed fixed-overhead control, then reports each named
  * query as the min of `reps` warm drains — the number a committed
  * BENCH_FULL entry is supposed to reproduce when the window was
  * clean.
  *
  * Usage:
  *   bash tools/run_main.sh graft.tools.QueryProbe <sfDir> <q1,q2,...> [reps]
  *
  * Output: one line per query, `probe <name> <sfDir> min=<s> runs=[..]`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.config.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // fixed-overhead control: scan init + codegen bootstrap, untimed
    spark.read.parquet(s"$sfDir/region.parquet").count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // one untimed warm drain (shuffle files, checkpoint blocks)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"probe $name $sfDir min=${runs.min}%.2f " +
        runs.map(r => f"$r%.2f").mkString("runs=[", ",", "]"))
    }
    spark.stop()
  }
}
