package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed BPE pins on the classic Sennrich et al. (2016)
  * example corpus — word frequencies low:5, lower:2, newest:6,
  * widest:3 — where every greedy merge (and every tie-break) can be
  * derived on paper. The full-corpus runs are DuckDB-oracled through
  * Verify; this pins the SEMANTICS: exact weighted pair counts, the
  * (freq DESC, pair ASC) tie order, left-to-right merge application,
  * and the apply query's per-doc symbol accounting.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq(
      (1L, "s", ("low " * 5).trim),
      (2L, "s", ("lower " * 2).trim),
      (3L, "s", ("newest " * 6).trim),
      (4L, "s", ("widest " * 3).trim))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("bpe train: the textbook greedy merge sequence, ties broken lexicographically") {
    val got = graft.text.Bpe.textBpeTrain(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // derivation: freq-weighted adjacent pair counts, recomputed after
    // each merge. Round 1 ties (e,s)=9 with (s,t)=9 -> 'e' < 's';
    // round 3 ties (l,o)=7 with (o,w)=7 -> 'l' < 'o'; round 5 ties
    // (e,w)=(n,e)=(w,est)=6 -> 'e' first; round 6 (ew,est) vs (n,ew)
    // -> 'ew' < 'n'; round 8 (d,est)=(i,d)=(w,i)=3 -> 'd' first.
    val expected = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L),
      (6, "ew", "est", "ewest", 6L),
      (7, "n", "ewest", "newest", 6L),
      (8, "d", "est", "dest", 3L))
    assert(got.toSeq == expected)
  }

  test("bpe apply: per-doc word and symbol counts after the learned merges") {
    val got = graft.text.Bpe.textBpeApply(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // low -> [low] (1 sym), lower -> [low,e,r] (3), newest -> [newest]
    // (1), widest -> [w,i,dest] (3)
    assert(got == Seq((1L, 5L, 5L), (2L, 2L, 6L), (3L, 6L, 6L),
      (4L, 3L, 9L)))
  }

  test("bpe train: empty corpus yields an empty merge table, not a crash") {
    val d = java.nio.file.Files.createTempDirectory("graft_bpe_e").toString
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      spark.read.parquet(s"$dir/documents.parquet").schema)
      .write.parquet(s"$d/documents.parquet")
    assert(graft.text.Bpe.textBpeTrain(spark, d).count() == 0L)
    assert(graft.text.Bpe.textBpeApply(spark, d).count() == 0L)
  }
}
