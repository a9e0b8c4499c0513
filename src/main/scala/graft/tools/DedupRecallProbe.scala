package graft.tools

import org.apache.spark.sql.functions._

/** Planted-duplicate recall prober for the near-dedup tiers AT SCALE
  * (dev tool, not part of the query surface) — round-14 verdict item
  * 7: the planted-dup recall specs run at fixture scale only, but the
  * recall-relevant dials (banded-LSH bucket population, the chunk
  * tier's bucket cap, shingle df distribution) all shift with corpus
  * size, so fixture recall does not by itself prove sf10 recall.
  * This main plants KNOWN duplicates into the probed corpus and
  * measures how many the live machinery recovers:
  *
  *  - dedup_near tier: for a deterministic sample of docs, a NEAR
  *    copy with every 25th token rewritten (≈12% of word-3-grams
  *    changed → true Jaccard ≈ 0.75-0.8, comfortably above the 0.5
  *    verify threshold but far from exact-dup) — recall = fraction
  *    of (original, copy) pairs surfaced by [[graft.vec.VectorOps
  *    .minhashPairs]] with dedup_near's exact dials (16 hashes,
  *    4 bands, minJaccard 0.5);
  *  - dedup_chunks_near tier: a SHIFTED full copy (prefix inserted,
  *    so ZERO exact 200/150 windows align — the case the exact chunk
  *    tier structurally misses) — recall = fraction of planted copies
  *    whose doc verdict from [[graft.text.TextOps.chunkNearDupStats]]
  *    is is_dup.
  *
  * Usage:
  *   bash tools/run_main.sh graft.tools.DedupRecallProbe <sfDir> [nPlants]
  *
  * Output: one line per tier,
  *   `planted_recall <tier> <sfDir> recall=<r> n=<plants>`.
  */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nPlants = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = graft.config.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
      .where($"text".isNotNull)
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val nDocs = docs.count()
    val mod = math.max(1L, nDocs / nPlants)
    // sample docs long enough that a near copy carries real shingle
    // mass and a shifted copy spans several chunks
    val base = docs
      .where(pmod($"doc_id", lit(mod)) === 0 && length($"text") >= 200)
      .localCheckpoint(true)
    val planted = base.select($"doc_id").as[Long].collect().toSet

    // ---- dedup_near tier: perturbed near copies ----
    val off1 = maxId + 1
    val nearCopies = base.select(($"doc_id" + off1).as("doc_id"),
      expr("array_join(transform(split(text, ' '), " +
           "(t, i) -> IF(i % 25 = 13, concat('plantnear', i), t)), ' ')")
        .as("text"))
    val pairs = graft.vec.VectorOps
      .minhashPairs(docs.unionByName(nearCopies),
        nHashes = 16, bands = 4, minJaccard = 0.5)
      .where($"doc_b" - $"doc_a" === off1)
      .select($"doc_a").as[Long].collect().toSet
    val rNear = planted.count(d => pairs.contains(d)).toDouble /
      math.max(1, planted.size)
    println(f"planted_recall dedup_near $sfDir recall=$rNear%.4f " +
      s"n=${planted.size}")

    // ---- dedup_chunks_near tier: shifted full copies ----
    val off2 = 2L * (maxId + 1)
    val shifted = base.select(($"doc_id" + off2).as("doc_id"),
      concat(lit("shifted planted preamble tokens here "), $"text").as("text"))
    val verdicts = graft.text.TextOps
      .chunkNearDupStats(docs.unionByName(shifted))
      .where($"doc_id" >= off2 && $"is_dup")
      .select(($"doc_id" - off2).as("doc_id")).as[Long].collect().toSet
    val rChunks = planted.count(d => verdicts.contains(d)).toDouble /
      math.max(1, planted.size)
    println(f"planted_recall dedup_chunks_near $sfDir recall=$rChunks%.4f " +
      s"n=${planted.size}")

    spark.stop()
  }
}
