package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KGramHashesUtil, TextFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** The rolling-hash expression must be bit-identical to the HOF fold
  * it replaced (doc_fingerprint / dedup_winnow hashed with the fold
  * through round 8, and the DuckDB oracles still spell it) — the same
  * differential discipline as WordNGramsSpec.
  */
class KGramHashesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private val M = 1000000007L

  private def hofHashes(k: Int) = expr(
    s"""transform(sequence(1, length(t) - ${k - 1}),
       |  i -> aggregate(filter(split(substr(t, i, $k), ''), c -> c != ''),
       |                 0L, (acc, c) -> (acc * 31 + ascii(c)) % $M))""".stripMargin)

  test("rolling == HOF fold on every fixture doc (incl. zh multibyte)") {
    val df = spark.read.parquet(s"${SparkSpec.sfDir}/documents.parquet")
      .select(lower(trim(regexp_replace($"text", "\\s+", " "))).as("t"))
      .where(length($"t") >= 8)
    val bad = df.select(
        TextFunctions.kgramHashes($"t", 8).as("native"), hofHashes(8).as("hof"))
      .where(not($"native" <=> $"hof")).count()
    assert(bad == 0, s"$bad fixture docs diverge from the HOF fold")
  }

  test("rolling == HOF fold on adversarial strings and other k") {
    val rows = Seq(
      "abcdefgh", "aaaaaaaaaaaa", "ab", "", " leading and   spaced ",
      "日本語のテキストと漢字が混ざる文章です", "mixed 漢字 and ascii 123",
      "éèê accents café naïve")
    for (k <- Seq(1, 3, 8)) {
      val df = rows.toDF("t").where(length($"t") >= k)
      val got = df.select(TextFunctions.kgramHashes($"t", k).as("n"),
                          hofHashes(k).as("h"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k diverged")
      }
    }
  }

  test("winnow_fingerprints == relational explode + sliding-min window + distinct") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(s"${SparkSpec.sfDir}/documents.parquet")
      .select($"doc_id",
        lower(trim(regexp_replace($"text", "\\s+", " "))).as("t"))
      .where(length($"t") >= 11)
    val native = df.select($"doc_id",
        TextFunctions.winnowFingerprints($"t", 8, 4).as("fp"))
      .groupBy($"doc_id").agg(sort_array(collect_set($"fp")).as("fps"))
    val relational = df
      .select($"doc_id",
        posexplode(TextFunctions.kgramHashes($"t", 8)).as(Seq("i", "h")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("fp", min($"h").over(
        Window.partitionBy($"doc_id").orderBy($"i").rowsBetween(0, 3)))
      .where($"i" <= $"n" - 4)
      .groupBy($"doc_id").agg(sort_array(collect_set($"fp")).as("fps"))
    val bad = native.as("a").join(relational.as("b"), "doc_id")
      .where(not($"a.fps" <=> $"b.fps")).count()
    assert(bad == 0, s"$bad docs diverge between generator and relational winnow")
    assert(native.count() == df.count())
  }

  test("winnow_fingerprints emits distinct values, one row each") {
    // 'aaaaaaaaaaaa': every 8-gram hashes identically -> exactly one fp
    val one = spark.sql(
      "SELECT winnow_fingerprints('aaaaaaaaaaaa', 8, 4) AS f").collect()
    assert(one.length == 1)
    // shorter than k+w-1 = 11 chars: no full window -> zero rows
    val none = spark.sql(
      "SELECT winnow_fingerprints('abcdefghij', 8, 4) AS f").collect()
    assert(none.isEmpty)
  }

  test("sub-k strings yield an empty array; null stays null") {
    assert(KGramHashesUtil.hashes(UTF8String.fromString("abc"), 8)
      .numElements() == 0)
    assert(KGramHashesUtil.hashes(null, 8).numElements() == 0)
    val viaSql = spark.sql(
      "SELECT kgram_hashes(CAST(NULL AS STRING), 8) AS h").head()
    assert(viaSql.isNullAt(0), "null input must stay null through the expression")
  }

  test("SQL registration works and matches the DataFrame surface") {
    val r = spark.sql("SELECT kgram_hashes('abcdefghij', 8) AS h")
      .head().getSeq[Long](0)
    val d = Seq("abcdefghij").toDF("t")
      .select(TextFunctions.kgramHashes($"t", 8)).head().getSeq[Long](0)
    assert(r == d && r.length == 3)
  }
}
