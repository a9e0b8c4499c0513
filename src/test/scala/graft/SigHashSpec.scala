package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pins for the native SigHash kernels: the round-14
  * re-seed's oracle SQL is a DuckDB list_reduce spelling of the HOF
  * folds, so the NATIVE expressions (graft.functions.MinhashSig /
  * Simhash64 — introduced because the HOF spelling measured 50–150×
  * slower) must produce the HOF folds' values bit-for-bit on every
  * input class: ASCII prose, repeated tokens, astral/combining
  * unicode, the empty string, single-word texts, and null elements.
  * The same-residue argument then transfers to the oracle unchanged.
  */
class SigHashSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private val polyHof: String => String = e =>
    s"aggregate(filter(split($e, ''), c -> c != ''), 0L, " +
    s"(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaa aaaa aaaa",
    "one",
    "",
    "emoji 😀🔥 and 中文 mixed İstanbul straße",
    "å combining ring and astral 𝔘 char")

  test("minhash_sig == the HOF fold spelling on every input class") {
    val nHashes = 16
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("w", split($"text", " "))
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, greatest(size(w)-3, 0)), i -> concat_ws(' ', get(w, i), get(w, i+1), get(w, i+2))))"))
      .withColumn("native",
        graft.functions.SigHashFunctions.minhashSig($"shingles", nHashes))
      .withColumn("hof", expr(
        s"transform(sequence(1, $nHashes), k -> array_min(transform(" +
        s"transform(shingles, sh -> ${polyHof("sh")}), " +
        s"h -> ${graft.util.SigHash.mix("h", "k")})))"))
    val rows = df.select($"doc_id", $"native", $"hof").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"minhash divergence on doc ${r.getLong(0)}: " +
        s"native=${r.getSeq[Long](1)} hof=${r.getSeq[Long](2)}")
    }
  }

  test("simhash64 == the HOF vote fold on every input class") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("toks", split($"text", " "))
      .withColumn("native", graft.functions.SigHashFunctions.simhash64($"toks"))
      .withColumn("hof_votes", expr(
        s"""aggregate(transform(toks, t -> ${polyHof("t")}),
          |  array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc, transform(sequence(0, 63),
          |    b -> CASE WHEN ${graft.util.SigHash.mix("h", "b + 101")} % 2 = 1
          |         THEN 1L ELSE -1L END),
          |    (a, v) -> a + v))""".stripMargin))
      .withColumn("hof", expr(
        "aggregate(zip_with(hof_votes, sequence(0, 63), " +
        "(v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END), " +
        "0L, (acc, x) -> acc + x)"))
    val rows = df.select($"doc_id", $"native", $"hof").collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"simhash divergence on doc ${r.getLong(0)}: " +
        s"native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("null handling: null text -> null sig/simhash, null shingle elements skipped") {
    val df = Seq((1L, Option("real text here with several words")),
                 (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val sig = graft.vec.VectorOps.minhashSignatures(df, nHashes = 16)
      .select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!sig(1L) && sig(2L), s"null-text sig contract broken: $sig")
    // null element inside the shingle array is SKIPPED (array_min
    // semantics), not propagated
    val withNull = Seq(Tuple1(Seq(Option("a b c"), None, Option("d e f"))))
      .toDF("shingles")
      .select(graft.functions.SigHashFunctions
        .minhashSig($"shingles".cast("array<string>"), 4).as("sig"))
      .head().getSeq[Long](0)
    val noNull = Seq(Tuple1(Seq("a b c", "d e f"))).toDF("shingles")
      .select(graft.functions.SigHashFunctions
        .minhashSig($"shingles", 4).as("sig"))
      .head().getSeq[Long](0)
    assert(withNull == noNull, "null shingle element must be skipped")
  }
}
