package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.11 — deliberate custom-function API-surface demos.
  *
  * Policy: built-ins beat UDFs (codegen, null handling, pushdown);
  * these two exist to pin the extension surface. The scalar UDF is a
  * pure function (safe to re-evaluate, no partition-order
  * dependence); the Aggregator keeps a fixed-size mutable buffer and
  * merges associatively/commutatively — the properties that make a
  * custom aggregate correct under ANY partitioning, which is the
  * contract that matters at 100 TB.
  */
object Udfs extends QueryPack {

  /** Polynomial text hash mod 1e9+7 — same recurrence as
    * TextOps.docFingerprint but as a Scala closure. Boxed return so a
    * null document hashes to NULL instead of NPE-ing the task: unlike
    * primitive-typed UDFs, Spark does not auto-skip null inputs for
    * object-typed (String) parameters. Iterates Unicode CODE POINTS,
    * not UTF-16 code units: `charAt` would hash an astral char (emoji)
    * as two surrogate values — a JVM encoding leak that diverges from
    * the code-point recurrence every other fingerprint in the engine
    * (docFingerprint's HOF fold, KGramHashes) and the DuckDB oracle
    * compute. Caught by the unicode-world differential (round 13). */
  private val polyHash: String => java.lang.Long = { s =>
    if (s == null) null
    else {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      acc
    }
  }

  /** Scalar Scala UDF, registered for both Column and SQL use. */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val normHash = udf(polyHash)
    s.udf.register("norm_hash", normHash)
    t(s, dir, "documents")
      .withColumn("norm", lower(trim($"text")))
      .select($"doc_id",
              normHash($"norm").as("h_col"),
              expr("norm_hash(norm)").as("h_sql"))
      .orderBy($"doc_id")
  }

  /** Typed Aggregator: per-label centroid of the 64-dim embeddings.
    * BUF = (running per-dim sums, count): fixed size, mergeable. */
  private object Centroid
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.fill(64)(0.0), 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      if (v == null) return b // null vector contributes nothing (= SQL avg)
      var i = 0
      while (i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < 64) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(r: (Array[Double], Long)): Seq[Double] =
      r._1.map(_ / r._2).toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Typed custom aggregate via functions.udaf. */
  def udafTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val centroid = org.apache.spark.sql.functions.udaf(Centroid)
    t(s, dir, "embeddings")
      .withColumn("emb", $"embedding".cast("array<double>"))
      .groupBy($"label")
      .agg(centroid($"emb").as("c"), count(lit(1)).as("n"))
      .select($"label", $"n",
              round(element_at($"c", 1), 4).as("c0"),
              round(element_at($"c", 2), 4).as("c1"),
              round(element_at($"c", 64), 4).as("c63"))
      .orderBy($"label")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "udf_scalar" -> (udfScalar _),
    "udaf_typed" -> (udafTyped _))

  def oracle: Map[String, String] = Map(
    "udf_scalar" ->
      // chr(304) = İ: the one SpecialCasing.txt character the unicode
      // world plants. Spark lower() applies the FULL Unicode lowercase
      // mapping (İ → i + U+0307) while DuckDB applies the simple
      // 1:1 mapping (İ → i); the replace() mirrors the full mapping so
      // the differential checks the hash recurrence, not the engines'
      // casing tables. No-op on İ-free text (every clean fixture).
      """WITH n AS (SELECT doc_id,
        |  lower(trim(replace(text, chr(304), 'i' || chr(775)))) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  -- NULL on null text, matching the boxed UDF (the
        |  -- list_prepend(0, ...) seed would fold a NULL list to 0)
        |  CASE WHEN norm IS NULL THEN NULL ELSE
        |    list_reduce(list_prepend(0::BIGINT,
        |      list_transform(string_split(norm, ''), c -> ascii(c))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) END AS h
        |  FROM n)
        |SELECT doc_id, h AS h_col, h AS h_sql FROM h ORDER BY doc_id""".stripMargin,
    "udaf_typed" ->
      """SELECT label, count(*) AS n,
        |  round(avg(embedding[1]::DOUBLE), 4) AS c0,
        |  round(avg(embedding[2]::DOUBLE), 4) AS c1,
        |  round(avg(embedding[64]::DOUBLE), 4) AS c63
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
}
