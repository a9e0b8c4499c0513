package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextMetrics

/** Hand-computed expectations for the corpus-quality metrics pack
  * (winnowing dedup, repetition, MAD outliers, lexical diversity).
  * The full-corpus runs are oracled by DuckDB through Verify; these
  * pin the SEMANTICS on planted fixtures small enough to hand-check.
  */
class TextMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def corpus(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))

  test("winnowing flags a planted near-copy and ignores unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "seventeen green bottles stand quietly on the old stone wall near town"
    val nearCopy = base.replace("seventeen", "nineteen")
    val unrelated1 = "completely different subject matter about maritime " +
      "navigation charts and the care of vintage sextants in humid climates"
    val unrelated2 = "a third text concerning the taxonomy of alpine " +
      "wildflowers and their pollinators at various elevations in spring"
    val pairs = TextMetrics.winnowPairs(corpus(Seq(
      (1L, "s", base), (2L, "s", nearCopy),
      (3L, "s", unrelated1), (4L, "s", unrelated2))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.mkString(",")}")
    assert(pairs.head._3 >= 0.5)
  }

  test("winnowing guarantee: identical docs across sources share every fingerprint") {
    // same text, different sources -> no pair (join is within-source),
    // same text same source -> sim exactly 1.0
    val t = "winnowing selects the minimum hash of each window of four " +
      "consecutive eight character grams over the normalized text body"
    val got = TextMetrics.winnowPairs(corpus(Seq(
      (1L, "s", t), (2L, "s", t), (3L, "other", t))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), s"got ${got.mkString(",")}")
  }

  test("repetition fractions on a hand-built degenerate doc") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b]
    //   n=5, top("a b")=3 -> top_frac 0.6; all grams duplicated -> dup 1.0
    // "x y z": 2-grams [x y, y z], none repeated
    val got = TextMetrics.repetition(corpus(Seq(
      (1L, "s", "a b a b a b"), (2L, "s", "x y z"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 5L, 3L, 0.6, 1.0),
      (2L, 2L, 1L, 0.5, 0.0)), s"got ${got.mkString(",")}")
  }

  test("MAD outlier flags the planted giant, not the mild deviants") {
    // lengths 8,9,10,11,100: med=10, devs 2,1,0,1,90, mad=1 -> only 90>3
    val rows = Seq(
      (1L, "s", "x" * 8), (2L, "s", "x" * 9), (3L, "s", "x" * 10),
      (4L, "s", "x" * 11), (5L, "s", "x" * 100))
    val got = TextMetrics.outlierMad(corpus(rows))
      .select($"doc_id", $"is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> false,
                      4L -> false, 5L -> true), s"got $got")
  }

  test("quality gate drops each planted offender for its own reason") {
    val prose = "the merchant weighed every crate of oranges before the " +
      "harbor master signed the manifest and the crew loaded them aboard"
    val repeats = Array.fill(12)("buy cheap pills now").mkString(" ")
    val lowdiv = Array.fill(30)("spam").mkString(" ")
    val rows = (1L to 7L).map(i => (i, "s", prose + " " + i)) ++ Seq(
      (8L, "s", repeats),                  // r_repetition
      (9L, "s", lowdiv),                   // r_lowdiv (and likely rep)
      (10L, "s", prose * 12))              // r_length (MAD outlier)
    val got = TextMetrics.qualityGate(corpus(rows))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    for (i <- 1L to 7L)
      assert(got(i) == ((false, false, false, true)), s"doc $i: ${got(i)}")
    assert(got(8L)._1 && !got(8L)._4, s"doc 8: ${got(8L)}")
    assert(got(9L)._2 && !got(9L)._4, s"doc 9: ${got(9L)}")
    assert(got(10L)._3 && !got(10L)._4, s"doc 10: ${got(10L)}")
  }

  test("entropy: uniform doc hits ln(n), degenerate doc hits 0") {
    // "a b c d": 4 distinct -> H = ln(4); "x x x x": H = 0
    val h = TextMetrics.entropy(corpus(Seq(
      (1L, "s", "a b c d"), (2L, "s", "x x x x"))))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(h(1L) == BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(h(2L) == 0.0)
  }

  test("zipf: a perfect power law scores slope -1 with r2 = 1") {
    // word i repeated round(64 / i) times, i = 1,2,4,8: freq = 64/rank
    // exactly at ranks 1,2,3,4 after sorting -> ln f = ln64 - ln r ...
    // ranks are 1..4 but freqs 64,32,16,8 = 64/2^(r-1): ln f linear in
    // ln 2^(r-1), NOT in ln r -> use freqs k/r directly instead
    val words = Seq((1, 12), (2, 6), (3, 4), (4, 3)) // f = 12/r exactly
      .flatMap { case (i, f) => Seq.fill(f)(s"w$i") }
    val got = TextMetrics.zipf(corpus(Seq((1L, "s", words.mkString(" ")))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 1)
    val (_, slope, r2) = got.head
    assert(slope == -1.0, s"slope $slope")
    assert(r2 == 1.0, s"r2 $r2")
  }

  test("cross-query invariant: 0 <= entropy <= ln(n_types) on every fixture doc") {
    // the uniform distribution maximizes Shannon entropy, so H must
    // sit in [0, ln(types)] — a differential between two independent
    // aggregations (entropy's c·ln c fold vs lexdiv's distinct count)
    val docs = spark.read.parquet(s"${SparkSpec.sfDir}/documents.parquet")
    val h = graft.text.TextMetrics.entropy(docs).select($"doc_id", $"entropy")
    val t = graft.text.TextMetrics.lexdiv(docs).select($"doc_id", $"n_types")
    val bad = h.join(t, "doc_id")
      // the 6-decimal rounding can poke at most 5e-7 past the bound
      .where($"entropy" < -1e-6 || $"entropy" > log($"n_types".cast("double")) + 1e-6)
      .count()
    assert(bad == 0, s"$bad docs violate the entropy bound")
  }

  test("agg_moments: symmetric data has zero skew, right tail positive") {
    import org.apache.spark.sql.functions.{round => _, _}
    val dir = java.nio.file.Files.createTempDirectory("graft_moments").toString
    val rows =
      Seq.tabulate(5)(i => (i.toLong, "SYM", Seq(-2.0, -1.0, 0.0, 1.0, 2.0)(i))) ++
      Seq.tabulate(5)(i => (10L + i, "TAIL", Seq(0.0, 0.0, 0.0, 0.0, 10.0)(i)))
    rows.toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    val got = graft.ops.Aggregates.aggMoments(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("SYM") == 0.0, s"symmetric skew: ${got("SYM")}")
    assert(got("TAIL") > 1.0, s"right-tail skew: ${got("TAIL")}")
  }

  test("lexical diversity counts tokens, types, hapax exactly") {
    // "a a b c": 4 tokens, 3 types, hapax {b,c} -> ttr .75, hapax 2/3
    val got = TextMetrics.lexdiv(corpus(Seq((1L, "s", "a a b c"))))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
                           r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq((4L, 3L, 2L, 0.75, 2.0 / 3.0)),
      s"got ${got.mkString(",")}")
  }

  test("keywords rank frequent-here-rare-elsewhere first, hand-checked") {
    // corpus: "rare" appears only in doc 1 (tf=2, df=1); "common" in
    // all 3 docs. N=3. doc1 scores: rare 2*(3-1)=4, common tf=1*(3-3)=0
    val got = TextMetrics.keywords(corpus(Seq(
      (1L, "s", "rare rare common"),
      (2L, "s", "common filler words"),
      (3L, "s", "common other stuff"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getInt(5)))
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.head == ((1L, "rare", 4L, 1)), s"got ${doc1.mkString(",")}")
    // per-doc: at most 3 rows, scores non-increasing along rk
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).reverse.sorted.reverse.sameElements(sorted.map(_._3)))
    }
  }

  test("bigram LM: natural order outscores a shuffled twin; probs <= 1") {
    // 9 docs share the strict sequence a->b->c->d; one doc scrambles
    // it. The scrambled doc's bigrams (b a, d c ...) are corpus-rare,
    // so its smoothed avg logprob must be lower.
    val natural = (1L to 9L).map(i => (i, "s", "a b c d a b c d"))
    val shuffled = Seq((10L, "s", "b a d c b a d c"))
    val gotMap = TextMetrics.bigramLm(corpus(natural ++ shuffled))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(gotMap(1L)._1 == 7L) // 8 tokens -> 7 bigrams
    assert(gotMap.values.forall(_._2 <= 0.0), "smoothed probs must be <= 1")
    assert(gotMap(10L)._2 < gotMap(1L)._2,
      s"shuffled ${gotMap(10L)._2} must score below natural ${gotMap(1L)._2}")
  }
}
