package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Null-payload fixture generator (dev tool, not part of the query
  * surface): copies a driver-generated sf world with deterministic
  * xxhash64-planted NULLs (~1 in 8 rows per column, distinct residues
  * per column so single-column nulls dominate but residue overlaps
  * produce fully-nulled payload rows too) in the VALUE columns of the
  * LLM-pipeline tables. Ids, keys and event time stay non-null — a
  * production ingest contract rejects a null primary key or event time
  * at the front door, while a null payload (crawler timeout, abstained
  * language detector, failed embed shard) flows through and must
  * neither kill the job nor change what the query means. TPC-H tables
  * are left untouched: their spec declares every column NOT NULL.
  *
  * Shared by NullInputSpec (completion sweep on a tiny world) and the
  * null-world oracle differential (`Verify` + `tools/check.py
  * --unordered` on this output — proves the 210 oracled queries keep
  * MATCHING DuckDB under nulls, not merely surviving them).
  *
  * Usage: runMain graft.tools.NullWorld <srcSfDir> <dstDir>
  */
object NullWorld {

  val tables: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** The per-table null plan: id column + value columns to nullify. */
  val plan: Map[String, (String, Seq[String])] = Map(
    "documents"  -> (("doc_id", Seq("text", "lang", "source", "n_chars"))),
    "embeddings" -> (("vec_id", Seq("embedding", "label"))),
    "events"     -> (("event_id", Seq("event_type", "value", "props"))))

  /** Nulls planted where pmod(xxhash64(id, colIndex), 8) == 0 — pure
    * column arithmetic, same rows on every run and every engine. */
  def nullify(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(c,
        when(pmod(xxhash64(col(idCol), lit(i)), lit(8)) === 0, lit(null))
          .otherwise(col(c)))
    }

  /** Write the null-planted copy of every fixture table under `dst`. */
  def write(spark: SparkSession, src: String, dst: String): Unit =
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = plan.get(t) match {
        case Some((id, cols)) => nullify(df, id, cols)
        case None             => df
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

  def main(args: Array[String]): Unit = {
    val spark = graft.config.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    write(spark, args(0), args(1))
    spark.stop()
  }
}
