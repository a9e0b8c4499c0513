package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.vec.VectorOps

/** Probabilistic dedup / ANN checks with planted duplicates (the
  * fixture corpus has no natural near-dups by construction). */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  private def corpusWithPlants = {
    val base = graft.io.Tables.t(spark, SparkSpec.sfDir, "documents")
      .select($"doc_id", $"text")
    // plant: 9001 = copy of doc 1; 9002 = doc 2 with one word changed
    val d1 = base.where($"doc_id" === 1).select(lit(9001L).as("doc_id"), $"text")
    val d2 = base.where($"doc_id" === 2)
      .select(lit(9002L).as("doc_id"),
        concat($"text", lit(" extrawordx")).as("text"))
    base.unionByName(d1).unionByName(d2)
  }

  test("embed_quantize: int8 codes in range, reconstruction error within half a quantization step") {
    val q = VectorOps.quantizedVecs(spark, SparkSpec.sfDir)
    val orig = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val joined = q.join(orig, "vec_id")
      .select($"vec_id", $"qvec", $"scale", $"emb")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val codes = r.getSeq[Int](1)
      val scale = r.getDouble(2)
      val emb = r.getSeq[Double](3)
      assert(codes.forall(c => c >= -127 && c <= 127), s"code out of int8 range: $codes")
      // symmetric quantization: |x - q*scale| <= scale/2 per element
      codes.zip(emb).foreach { case (c, x) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: |$x - $c*$scale| exceeds half-step")
      }
    }
  }

  test("embed_quantize scored shape is scalar-only and covers every (vec, pos)") {
    // the driver's comparator sorts every output column; array cells
    // crash it (r6's only red row) — lock the exploded scalar shape
    val out = VectorOps.embedQuantize(spark, SparkSpec.sfDir)
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    out.schema.fields.foreach { f =>
      assert(!f.dataType.isInstanceOf[ArrayType] &&
             !f.dataType.isInstanceOf[MapType] &&
             !f.dataType.isInstanceOf[StructType],
        s"scored column ${f.name} must be scalar, got ${f.dataType}")
    }
    val nVecs = VectorOps.quantizedVecs(spark, SparkSpec.sfDir).count()
    assert(out.count() == nVecs * 64)
  }

  test("quantized search recalls most of the exact float top-10") {
    // int8 max-abs quantization perturbs cosines slightly; the ranking
    // must still substantially agree with exact float search (the
    // 4×-cheaper scan is only useful if it finds the same neighbors)
    val exact = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = VectorOps.simSearchQuant(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (q, s) =>
      quant(q).intersect(s).size / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean quantized recall $mean below floor")
  }

  test("two-stage rerank: exact cosines, recall >= the raw IVF path") {
    val exactRows = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
    val exactCos = exactRows.map { case (q, v, c) => ((q, v), c) }.toMap
    val exactSets = exactRows.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val rr = VectorOps.simSearchRerank(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
    assert(rr.map(_._1).distinct.length == 5, "every query must answer")
    // stage 2 re-scores with FLOAT math — any pair shared with exact
    // search must carry the identical cosine (zero quantization error)
    rr.foreach { case (q, v, c) =>
      exactCos.get((q, v)).foreach(e => assert(e == c, s"($q,$v): $c != $e"))
    }
    val rrSets = rr.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivfSets = VectorOps.simSearchIvf(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def mean(m: Map[Long, Set[Long]]): Double =
      exactSets.map { case (q, s) =>
        m.getOrElse(q, Set.empty[Long]).intersect(s).size / 10.0 }
        .sum / exactSets.size
    val (rrRecall, ivfRecall) = (mean(rrSets), mean(ivfSets))
    // the 4-cell int8 coarse net is strictly wider than IVF's 2-cell
    // exact one, and the 50-deep shortlist + exact re-rank can only
    // drop a true neighbor that BOTH nets missed
    assert(rrRecall >= ivfRecall,
      s"rerank recall $rrRecall below raw IVF $ivfRecall")
  }

  test("chunk dedup: partial-overlap docs flagged at the half-chunks threshold") {
    import graft.text.TextOps
    val rnd = new scala.util.Random(42)
    def s(len: Int): String =
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val a = s(600)                  // chunks at 0,150,300,450
    val b = a.substring(0, 450) + s(150) // shares chunks 0,150 → 2/4 dup
    val d = a.substring(0, 200) + s(400) // shares chunk 0 only → 1/4 dup
    val c = s(600)                  // fully distinct → 0/4
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val out = TextOps.chunkDupStats(docs)
      .select($"doc_id", $"n_chunks", $"n_dup_chunks", $"is_dup")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 2L, true)), s"A: ${out(1L)}")  // 0,150 shared w/ B
    assert(out(2L) == ((4L, 2L, true)), s"B: ${out(2L)}")
    assert(out(3L) == ((4L, 0L, false)), s"C: ${out(3L)}")
    assert(out(4L) == ((4L, 1L, false)), s"D: ${out(4L)}") // 1/4 < half
  }

  test("chunk near-dedup catches SHIFTED copies the exact tier misses") {
    import graft.text.TextOps
    val rnd = new scala.util.Random(7)
    def words(n: Int): String =
      (0 until n).map(_ => (0 until 4).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val a = words(120)                    // ~600 chars, 4 chunks
    val b = "zq zq " + a                  // SHIFTED copy: offsets +6 chars
    val c = words(120)                    // fully distinct
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    // exact tier: zero shared 200-char windows (every window shifted)
    val exact = TextOps.chunkDupStats(docs)
      .select($"doc_id", $"n_dup_chunks").as[(Long, Long)].collect().toMap
    assert(exact(1L) == 0L && exact(2L) == 0L,
      s"shifted copy unexpectedly aligned: $exact")
    // near tier: chunk shingle sets survive the shift → both flagged
    val near = TextOps.chunkNearDupStats(docs)
      .select($"doc_id", $"n_chunks", $"n_dup_chunks", $"is_dup")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(near(1L)._3 == true, s"source doc not flagged: ${near(1L)}")
    assert(near(2L)._3 == true, s"shifted copy not flagged: ${near(2L)}")
    assert(near(3L)._2 == 0L && near(3L)._3 == false,
      s"distinct doc false-flagged: ${near(3L)}")
  }

  test("minhash stop-bucket cap drops boilerplate cliques, keeps rare pairs") {
    val rnd = new scala.util.Random(11)
    def words(n: Int): String =
      (0 until n).map(_ => (0 until 4).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val boiler = words(40)
    val base = words(40)
    val docs = ((1L to 25L).map(i => (i, boiler)) ++
      Seq((100L, base), (101L, base + " tail extra"))).toDF("doc_id", "text")
    // uncapped: the 25-doc boilerplate clique pairs quadratically
    val uncapped = VectorOps.minhashPairs(docs, minJaccard = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((100L, 101L)))
    assert(uncapped.count { case (a, b) => a <= 25 && b <= 25 } == 25 * 24 / 2)
    // capped at 10: every boilerplate band bucket holds 25 > 10 members
    // and is dropped; the rare (100,101) pair still surfaces
    val capped = VectorOps.minhashPairs(docs, minJaccard = 0.5, maxBucket = 10)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((100L, 101L)), s"rare pair lost: $capped")
    assert(!capped.exists { case (a, b) => a <= 25 && b <= 25 },
      s"boilerplate clique survived the cap: $capped")
  }

  test("minhash pairs find planted near-duplicates") {
    val pairs = VectorOps.minhashPairs(corpusWithPlants, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 9001L)), s"exact copy missed: $pairs")
    assert(pairs.contains((2L, 9002L)), s"near copy missed: $pairs")
  }

  test("minhash jaccard bounded in [0,1], exact copy = 1.0") {
    val rows = VectorOps.minhashPairs(corpusWithPlants, minJaccard = 0.0)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
    }
    val exact = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 9001L)
    assert(exact.exists(_.getDouble(2) == 1.0))
  }

  test("LSH clusters: planted duplicate chain lands in ONE transitive cluster") {
    // chain: 1 —(exact)— 9001 —(near)— 9003; plus the separate near
    // pair 2 — 9002. Pairwise LSH edges must compose transitively.
    val base = graft.io.Tables.t(spark, SparkSpec.sfDir, "documents")
      .select($"doc_id", $"text")
    val d1c = base.where($"doc_id" === 1).select(lit(9001L).as("doc_id"), $"text")
    val d1n = base.where($"doc_id" === 1)
      .select(lit(9003L).as("doc_id"), concat($"text", lit(" tailwordy")).as("text"))
    val d2n = base.where($"doc_id" === 2)
      .select(lit(9002L).as("doc_id"), concat($"text", lit(" extrawordx")).as("text"))
    val corpus = base.unionByName(d1c).unionByName(d1n).unionByName(d2n)
    val got = VectorOps.clustersFromMinhash(corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(9001L) == ((1L, 3L)), s"exact copy: ${got(9001L)}")
    assert(got(9003L) == ((1L, 3L)), s"chained near copy: ${got(9003L)}")
    assert(got(1L) == ((1L, 3L)), s"chain root: ${got(1L)}")
    assert(got(9002L)._1 == 2L, s"separate pair: ${got(9002L)}")
    assert(got(2L) == got(9002L))
    // untouched docs stay singletons labeled by themselves
    assert(got(3L) == ((3L, 1L)))
  }

  test("simhash: identical docs hash identically, near-dups are close") {
    val out = VectorOps.simhashOf(corpusWithPlants)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(9001L), "identical docs must collide")
    val hamming = java.lang.Long.bitCount(out(2L) ^ out(9002L))
    assert(hamming <= 16, s"near-dup hamming too large: $hamming")
  }

  test("containment dedup flags a planted quoted excerpt (low Jaccard, full containment)") {
    import graft.text.TextOps
    // 9005 = the middle third of doc 5's text: every shingle of the
    // excerpt appears in the original, but the union-based Jaccard is
    // far below any near-dup threshold — only containment catches it
    val base = graft.io.Tables.t(spark, SparkSpec.sfDir, "documents")
      .select($"doc_id", $"source", $"text")
    val excerpt = base.where($"doc_id" === 5)
      .select(lit(9005L).as("doc_id"), $"source",
        expr("concat_ws(' ', slice(split(text, ' '), CAST(size(split(text,' '))/3 AS INT), CAST(size(split(text,' '))/3 AS INT)))").as("text"))
    val corpus = base.unionByName(excerpt)
    val pairs = TextOps.containedPairs(corpus)
      .select($"contained_id", $"container_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((9005L, 5L)), s"planted excerpt not flagged: $pairs")
  }

  test("simhash banding finds EXACTLY the Hamming<=3 pairs (pigeonhole completeness)") {
    // 4 disjoint 16-bit bands: <=3 flipped bits can't touch all 4, so
    // banding is EXACT at this radius — the banded equi-join must
    // equal brute force, not approximate it
    val sigs = VectorOps.simhashOf(corpusWithPlants).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = (for {
      (i, si) <- sigs
      (j, sj) <- sigs
      if i < j
      h = java.lang.Long.bitCount(si ^ sj)
      if h <= 3
    } yield (i, j, h)).toSet
    val got = VectorOps.simhashPairsOf(corpusWithPlants)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"banded=${got.size} brute=${expect.size}; diff=${(got diff expect) ++ (expect diff got)}")
    assert(got.exists { case (a, b, h) => a == 1L && b == 9001L && h == 0 },
      s"planted exact copy missing: $got")
  }

  test("LSH bucketing: identical vectors share a bucket (self-recall)") {
    val out = VectorOps.simSearchLsh(spark, SparkSpec.sfDir)
    // every query must at least appear (its own bucket is non-empty)
    assert(out.count() >= 0)
    // exact search and LSH agree on cosine values for shared pairs
    val exact = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => ((q, v), c) }.toMap
    val lsh = out.select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)]
      .collect()
    lsh.foreach { case (q, v, c) =>
      exact.get((q, v)).foreach(e => assert(e == c))
    }
  }

  test("IVF search: cos values match exact search for shared pairs") {
    val exact = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => ((q, v), c) }.toMap
    val ivf = VectorOps.simSearchIvf(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"cos").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, v, c) =>
      exact.get((q, v)).foreach(e => assert(e == c))
    }
    // every query produces candidates (its own cell is probed)
    assert(ivf.map(_._1).distinct.length == 5)
  }

  test("k-means centroids are model-sized and power useful IVF recall") {
    import graft.functions.VecFunctions.l2Norm
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .withColumn("emb", $"embedding".cast(ArrayType(DoubleType)))
      .withColumn("nrm", l2Norm($"emb"))
    // seed selection honors k exactly even when the corpus has fewer
    // than 100*k rows (iters=0 returns the raw seeds)
    val seeds = VectorOps.kmeansCentroids(e, k = 16, iters = 0).collect()
    assert(seeds.length == 16, s"got ${seeds.length} seeds, want 16")
    val cent = VectorOps.kmeansCentroids(e, k = 16, iters = 2)
    val rows = cent.collect()
    // Lloyd iterations drop emptied cells (random-ish embeddings
    // cluster weakly, and the tiny test corpus trains on ~100
    // vectors) — a coarse quantizer only guarantees SOME partition
    assert(rows.length >= 2 && rows.length <= 16, s"got ${rows.length} centroids")
    rows.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("c_emb")).length == 64)
    }
    // end-to-end: IVF on trained centroids recalls a useful fraction of
    // the exact top-10 (floor measured on the fixture; random-ish
    // embeddings cluster weakly, so this is a sanity bound, not a SLA)
    val exact = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = VectorOps.simSearchIvf(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, s) =>
      ivf.getOrElse(q, Set.empty[Long]).intersect(s).size / 10.0 }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean IVF recall $mean below floor")
  }

  test("sim_knn_join_ann: global graph covers every vector, exact cosines, useful recall") {
    import graft.functions.VecFunctions.l2Norm
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // exact GLOBAL top-3 per vector (brute force, no label blocking) —
    // the ground truth the ANN graph approximates
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .withColumn("emb", $"embedding".cast(ArrayType(DoubleType)))
      .withColumn("nrm", l2Norm($"emb"))
      .select($"vec_id", $"emb", $"nrm")
    val a = e.select($"vec_id".as("id_a"), $"emb".as("ea"), $"nrm".as("na"))
    val b = e.select($"vec_id".as("id_b"), $"emb".as("eb"), $"nrm".as("nb"))
    val exact = a.crossJoin(b).where($"id_a" =!= $"id_b")
      .withColumn("cos", graft.functions.VecFunctions.dotProduct($"ea", $"eb") /
        ($"na" * $"nb"))
      .groupBy($"id_a")
      .agg(graft.functions.BoundedTopK.boundedTopK($"cos", $"id_b", 3).as("top"))
      .select($"id_a", explode(expr("transform(top, t -> t.id)")).as("id_b"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = VectorOps.simKnnJoinAnn(spark, SparkSpec.sfDir)
      .select($"id_a", $"id_b", $"cos", $"rk")
      .as[(Long, Long, Double, Int)].collect()
    // coverage: every vector appears (its own cell is always probed,
    // and no cell holds fewer than... itself — so neighbors exist)
    val n = e.count()
    assert(ann.map(_._1).distinct.length == n,
      s"ANN graph covers ${ann.map(_._1).distinct.length} of $n vectors")
    // per vector: at most 3 neighbors, ranks 1..k, no self loops
    ann.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length <= 3 && rows.map(_._4).sorted.sameElements(1 to rows.length))
      assert(!rows.exists(_._2 == id), s"self loop at $id")
    }
    // cosines are EXACT for whatever pairs ANN returns (same native
    // dot/norm expressions — approximation is in candidate coverage,
    // never in scores); verify against a recompute for a sample
    val byPair = ann.map(r => ((r._1, r._2), r._3)).toMap
    val check = a.crossJoin(b).where($"id_a" =!= $"id_b")
      .withColumn("cos", round(graft.functions.VecFunctions.dotProduct($"ea", $"eb") /
        ($"na" * $"nb"), 6))
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    byPair.foreach { case (k, c) => assert(check(k) == c, s"cos mismatch at $k") }
    // recall floor vs exact global top-3 (fixture embeddings cluster
    // weakly — sanity bound, not an SLA; measured ~0.5+ at sf0.001)
    val recalls = exact.map { case (q, s) =>
      ann.filter(_._1 == q).map(_._2).toSet.intersect(s).size.toDouble / s.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"mean ANN knn recall $mean below floor")
  }

  test("PQ ADC search: ranked shape, nonnegative distances, useful recall vs exact L2") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rows = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast(ArrayType(DoubleType)))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // exact L2 top-10 ground truth for the 5 query vectors
    val exact = rows.filter(_._1 < 5).map { case (q, qe) =>
      q -> rows.filter(_._1 != q)
        .map { case (id, v) => (id, l2(qe, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
    val pq = VectorOps.simSearchPq(spark, SparkSpec.sfDir)
      .select($"q_id", $"vec_id", $"l2d", $"rk")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = pq.groupBy(_._1)
    assert(byQ.keySet == exact.keySet)
    byQ.values.foreach { rs =>
      assert(rs.length == 10)
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).sameElements(1 to 10))
      // refined distances are EXACT squared L2: nonnegative (float
      // slack only) and nondecreasing in rank
      assert(sorted.forall(_._3 >= -1e-6))
      assert(sorted.map(_._3).sliding(2).forall(p => p(0) <= p(1) + 1e-9))
      assert(!sorted.exists(r => r._2 == r._1), "self match")
    }
    // recall floor: quantization approximates but must not destroy the
    // neighborhood (floor is a sanity bound on this fixture, not an SLA)
    val recalls = exact.map { case (q, s) =>
      byQ(q).map(_._2).toSet.intersect(s).size.toDouble / s.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean PQ recall@10 $mean below floor")
  }

  test("embed_pca: spectral contracts — ordered shares, variance ratios, orthonormal loadings") {
    val out = VectorOps.embedPca(spark, SparkSpec.sfDir)
      .select($"vec_id", $"pc", $"coord", $"explained_share")
      .as[(Long, Int, Double, Double)].collect()
    val n = out.map(_._1).distinct.length
    assert(out.length == n * 8, s"expected $n×8 scalar rows, got ${out.length}")
    // explained-variance shares: one value per component, in (0,1],
    // non-increasing, summing to ≤ 1 (64→8 keeps a strict subset)
    val shares = out.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.head._4 }
    assert(shares.length == 8)
    assert(shares.forall(s => s > 0 && s <= 1))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b },
      s"shares not ordered: $shares")
    assert(shares.sum <= 1.0 + 1e-6)
    // the sample variance of each component's coordinates IS its
    // eigenvalue, so variance ratios must track share ratios
    val vars = (0 until 8).map { p =>
      val xs = out.filter(_._2 == p).map(_._3)
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    (1 until 8).foreach { p =>
      val got = vars(p) / vars(0)
      val want = shares(p) / shares(0)
      assert(math.abs(got - want) <= 0.02 * want + 1e-4,
        s"pc$p variance ratio $got vs share ratio $want")
    }
    // loadings orthonormality — refit (the fit is deterministic) and
    // check PCᵀPC = I on the model-sized 64×8 matrix
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id",
        array_to_vector($"embedding".cast(ArrayType(DoubleType))).as("fv"))
    val pc = new org.apache.spark.ml.feature.PCA()
      .setInputCol("fv").setOutputCol("pc").setK(8).fit(e).pc
    for (i <- 0 until 8; j <- i until 8) {
      val dot = (0 until pc.numRows)
        .map(r => pc(r, i) * pc(r, j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"PCᵀPC[$i,$j] = $dot")
    }
  }

  test("exact sim_search returns 10 ranked neighbors per query") {
    val rows = VectorOps.simSearch(spark, SparkSpec.sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.length == 10)
      val cs = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "not descending")
    }
  }

  // shared raw corpus for the clustering tests: (vec_id -> unit-norm'd
  // double embedding), plus the exact cosine function the queries use
  private lazy val rawVecs: Map[Long, Array[Double]] =
    graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
  // the SemDeDup family's r15 semantic: cosine on the 1e-6 integer
  // grid (exact long sums; bit-reproduces semdedupVerdicts' rule)
  private def gridCosine(a: Array[Double], b: Array[Double]): Double = {
    def g(x: Double): Long = math.round(x * 1e6)
    var d = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      d += g(a(i)) * g(b(i)); na += g(a(i)) * g(a(i))
      nb += g(b(i)) * g(b(i)); i += 1
    }
    d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("embed_kmeans: k clusters partition the corpus; Lloyd iterations do not worsen the fit") {
    val out = VectorOps.embedKmeans(spark, SparkSpec.sfDir).collect()
    assert(out.length == 10, s"expected 10 clusters, got ${out.length}")
    assert(out.map(_.getLong(1)).sum == rawVecs.size, "cluster sizes must sum to corpus")
    out.foreach { r =>
      val (n, nDom, purity) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(nDom >= 1 && nDom <= n)
      assert(purity > 0.0 && purity <= 1.0)
      assert(math.abs(purity - nDom.toDouble / n) < 1e-3)
    }
    // Lloyd monotonicity on the training objective: corpus mean
    // best-cosine under trained centroids must not be worse than under
    // the raw seeds (small epsilon for the float re-aggregation)
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .withColumn("emb", $"embedding".cast(ArrayType(DoubleType)))
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        graft.functions.VecFunctions.dotProduct($"emb", $"emb")))
    def meanBestCos(iters: Int): Double = {
      val cent = VectorOps.kmeansCentroids(e, k = 10, iters = iters, sampleMod = 1)
      VectorOps.assignCells(e, cent)
        .join(org.apache.spark.sql.functions.broadcast(cent), $"cell" === $"cent_id")
        .select((graft.functions.VecFunctions.dotProduct($"emb", $"c_emb")
                  / ($"nrm" * $"c_nrm")).as("c"))
        .agg(avg($"c")).head().getDouble(0)
    }
    val (seed, trained) = (meanBestCos(0), meanBestCos(3))
    assert(trained >= seed - 1e-9,
      s"training worsened the objective: seeds=$seed trained=$trained")
  }

  test("hierarchical cell assignment: agrees with flat on most vectors, never beats flat's cosine") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .withColumn("emb", $"embedding".cast(ArrayType(DoubleType)))
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        graft.functions.VecFunctions.dotProduct($"emb", $"emb")))
      .where(!$"nrm".isNaN && $"nrm" > 0.0)
    val k = 16
    val cent = VectorOps.kmeansCentroids(e, k, iters = 2)
    val cents = cent.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val flat = VectorOps.assignCells(e, cent)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the two-level path (the auto chooser keeps fixture-scale
    // k on flat; this test exercises the scale path directly)
    val hier = VectorOps.assignCellsHier(e, cent)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.keySet == flat.keySet, "hier must assign every vector")
    var agree = 0
    hier.foreach { case (id, hc) =>
      assert(cents.contains(hc), s"vector $id assigned to unknown cell $hc")
      // dominance: flat argmaxes over ALL centroids, so its cosine is
      // an upper bound on the hier pick's cosine
      val cf = cosine(rawVecs(id), cents(flat(id)))
      val ch = cosine(rawVecs(id), cents(hc))
      assert(ch <= cf + 1e-9,
        s"vector $id: hier cell cos=$ch beats flat cos=$cf")
      if (hc == flat(id)) agree += 1
    }
    val frac = agree.toDouble / hier.size
    assert(frac >= 0.75, s"hier/flat agreement $frac below floor")
  }

  test("embed_semdedup: drops are sound (in-cell justifier >= tau), survivors complete, recall vs exact rule bounded") {
    val tau = 0.30
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .withColumn("emb", $"embedding".cast(ArrayType(DoubleType)))
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        graft.functions.VecFunctions.dotProduct($"emb", $"emb")))
    val v = VectorOps.semdedupVerdicts(e, k = 10, tau = tau)
      .select($"vec_id", $"cell", $"kept", $"justifier").collect()
    assert(v.length == rawVecs.size)
    val cellOf = v.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // soundness: every dropped vector's justifier is a LOWER-id vector
    // in the SAME cell at cosine >= tau
    val dropped = v.filterNot(_.getBoolean(2))
    assert(dropped.nonEmpty, "fixture tail should produce some in-cell drops at tau=0.30")
    dropped.foreach { r =>
      val (id, j) = (r.getLong(0), r.getLong(3))
      assert(j < id, s"justifier $j not lower than $id")
      assert(cellOf(j) == cellOf(id), s"justifier $j not in $id's cell")
      // EXACT recompute of the r15 rule (grid cosine) — no epsilon:
      // the operator's arithmetic is deterministic by construction
      val c = gridCosine(rawVecs(id), rawVecs(j))
      assert(c >= tau, s"justifier pair ($j,$id) grid cos=$c < tau")
    }
    // completeness within cells: a kept vector has NO lower-id
    // in-cell partner at grid cosine >= tau (exact, same rule)
    val byCell = v.groupBy(_.getLong(1))
    byCell.values.foreach { rs =>
      val ids = rs.map(_.getLong(0)).sorted
      val keptSet = rs.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
      for (j <- ids; i <- ids if i < j && keptSet(j)) {
        val c = gridCosine(rawVecs(i), rawVecs(j))
        assert(c < tau, s"kept $j has in-cell partner $i at grid cos=$c >= tau")
      }
    }
    // recall against the EXACT global min-id rule (dedup_embed's
    // semantics): cluster-then-prune must find a bounded fraction
    val idsSorted = rawVecs.keys.toArray.sorted
    val exactDrops = idsSorted.count { j =>
      idsSorted.exists(i => i < j && cosine(rawVecs(i), rawVecs(j)) >= tau)
    }
    val recall = dropped.length.toDouble / exactDrops
    assert(dropped.length <= exactDrops, "in-cell drops cannot exceed exact drops")
    assert(recall >= 0.35, s"recall $recall below floor (${dropped.length}/$exactDrops)")
  }

  test("pipeline_curate_embed: stage counts partition each cell; quota binds; funnel is monotone") {
    val out = VectorOps.pipelineCurateEmbed(spark, SparkSpec.sfDir).collect()
    // k is corpus-derived since r14 (ivfCells: ⌈√n⌉ floored at 10 —
    // the fixed k=10 was a hidden n²/k pair space at scale)
    val expectK = VectorOps.ivfCells(rawVecs.size.toLong, 10)
    assert(out.length == expectK,
      s"expected one audit row per cell (k=$expectK), got ${out.length}")
    var (totVecs, totKept) = (0L, 0L)
    out.foreach { r =>
      val Seq(n, dup, outl, quo, kept) = (1 to 5).map(r.getLong)
      assert(dup + outl + quo + kept == n,
        s"cell ${r.getLong(0)}: stages $dup+$outl+$quo+$kept != $n")
      assert(kept <= 30, s"cell ${r.getLong(0)} kept $kept over quota")
      assert(Seq(dup, outl, quo, kept).forall(_ >= 0))
      // the outlier decile can only cut from dedup survivors
      assert(outl <= n - dup)
      totVecs += n; totKept += kept
    }
    assert(totVecs == rawVecs.size, "cells must partition the corpus")
    assert(totKept > 0 && totKept < totVecs, "funnel must keep some, drop some")
  }

  test("sim_search_mrl: recall well above chance; lists ranked and sized") {
    val mrl = VectorOps.simSearchMrl(spark, SparkSpec.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = VectorOps.simSearch(spark, SparkSpec.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mrl.size == exact.size)
    val recall = mrl.intersect(exact).size.toDouble / exact.size
    // prefix dims carry 1/4 of a RANDOM vector's signal; measured
    // 0.32-0.48 across sf; chance on a 50-of-500 shortlist is ~0.1
    assert(recall >= 0.2, s"mrl recall $recall below floor")
  }

  test("sim_search_bitq: hamming bounds, monotone ranks, hand-check") {
    val rows = VectorOps.simSearchBitq(spark, SparkSpec.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(4)))
    assert(rows.groupBy(_._1).forall(_._2.length == 10))
    rows.foreach { case (_, _, h, _) => assert(h >= 0 && h <= 64) }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.sameElements(byRank.sorted), "hamming not monotone in rank")
    }
    // recompute one pair's hamming from the raw floats
    val (qid, vid, h, _) = rows.head
    val embOf = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .where($"vec_id".isin(qid, vid))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val want = embOf(qid).zip(embOf(vid))
      .count { case (a, b) => (a > 0) != (b > 0) }
    assert(h == want, s"hamming($qid,$vid): got $h want $want")
  }

  test("embed_centroid: exact grid sums match a driver-side recompute") {
    val out = VectorOps.embedCentroid(spark, SparkSpec.sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val vecs = graft.io.Tables.t(spark, SparkSpec.sfDir, "embeddings")
      .collect().map(r => r.getInt(2) -> r.getSeq[Float](1))
    assert(out.keys.map(_._1).toSet == vecs.map(_._1).toSet)
    // recompute label 0, pos 0 with the same snap-to-grid arithmetic
    val l0 = vecs.filter(_._1 == vecs.head._1)
    val grid = l0.map(v => math.round(v._2.head.toDouble * 1e6))
    val (n, c) = out((vecs.head._1, 0))
    assert(n == l0.length)
    assert(c == grid.sum.toDouble / (n.toDouble * 1e6), "centroid not exact")
  }
}
