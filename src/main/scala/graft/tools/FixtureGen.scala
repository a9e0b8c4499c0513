package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator for the scale-growth validation runs
  * (dev tool, not part of the query surface): replicates the
  * driver-generated sf0.1 fixtures `mult`× with per-replica key
  * offsets, producing a self-consistent larger world (every FK keeps
  * pointing inside its replica) whose schemas, domains and
  * distributions match FIXTURES.md — so per-query times at sfN vs
  * sf0.1 measure SCALING, not a different workload.
  *
  * Two tables get deterministic per-replica PERTURBATION instead of
  * verbatim copies, because cloning them would plant artificial
  * duplicate structure that distorts exactly the queries the scale run
  * is meant to validate:
  *  - documents: every 7th token (phase k) rewrites to a
  *    replica-tagged token — cross-replica shingle overlap stays high
  *    (the fixture's own word-soup property) but no doc is an exact or
  *    near-exact clone of its replica siblings, so dedup candidate
  *    groups grow ~linearly with scale as they would on real data;
  *  - embeddings: a small deterministic hash jitter per dimension —
  *    cosine structure (weak label clusters) survives, exact-duplicate
  *    vectors don't.
  * Everything is hash-derived: no RNG, same output on every run.
  *
  * Usage: runMain graft.tools.FixtureGen <srcSfDir> <dstDir> [mult]
  */
object FixtureGen {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.config.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimension constants: identical at every scale factor
    write(read("region"), "region")
    write(read("nation"), "nation")

    // star schema: replicate with self-consistent key offsets
    val cust = read("customer"); val kCust = maxOf(cust, "c_custkey")
    val supp = read("supplier"); val kSupp = maxOf(supp, "s_suppkey")
    val part = read("part");     val kPart = maxOf(part, "p_partkey")
    val ord  = read("orders");   val kOrd  = maxOf(ord, "o_orderkey")
    val evt  = read("events");   val kEvt  = maxOf(evt, "event_id")
    val kUser = maxOf(evt, "user_id")
    val docs = read("documents"); val kDoc = maxOf(docs, "doc_id")
    val embs = read("embeddings"); val kVec = maxOf(embs, "vec_id")

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(k => shift(df, k)).reduce(_ unionByName _)

    write(replicate(cust)((d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * kCust))), "customer")
    write(replicate(supp)((d, k) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(k * kSupp))), "supplier")
    write(replicate(part)((d, k) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(k * kPart))), "part")
    write(replicate(ord)((d, k) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * kOrd))
      .withColumn("o_custkey", col("o_custkey") + lit(k * kCust))), "orders")
    write(replicate(read("lineitem"))((d, k) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * kOrd))
      .withColumn("l_partkey", col("l_partkey") + lit(k * kPart))
      .withColumn("l_suppkey", col("l_suppkey") + lit(k * kSupp))), "lineitem")
    write(replicate(evt)((d, k) => d
      .withColumn("event_id", col("event_id") + lit(k * kEvt))
      .withColumn("user_id", col("user_id") + lit(k * kUser))), "events")
    write(replicate(docs)((d, k) => d
      .withColumn("doc_id", col("doc_id") + lit(k * kDoc))
      .withColumn("text",
        if (k == 0) col("text")
        else expr(s"array_join(transform(split(text, ' '), " +
          s"(w, i) -> CASE WHEN (i + $k) % 7 = 0 THEN concat('r$k', w) " +
          s"ELSE w END), ' ')"))), "documents")
    write(replicate(embs)((d, k) => d
      .withColumn("vec_id", col("vec_id") + lit(k * kVec))
      .withColumn("embedding",
        if (k == 0) col("embedding")
        else expr(s"transform(embedding, (x, i) -> CAST(x + 0.05 * " +
          s"(pmod(hash(vec_id, i, $k), 1000) / 1000.0 - 0.5) AS FLOAT))"))),
      "embeddings")

    spark.stop()
  }
}
