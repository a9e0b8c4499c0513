package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline

/** The pipeline layer must compose into ONE logical plan that Catalyst
  * optimizes across stage boundaries. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.session
  import spark.implicits._

  test("stages compose in order") {
    val pipe = Pipeline(
      "double" -> (_.withColumn("x", $"x" * 2)),
      "inc"    -> (_.withColumn("x", $"x" + 1)))
    val out = pipe(Seq(1, 2, 3).toDF("x")).as[Int].collect().sorted
    assert(out.toSeq == Seq(3, 5, 7)) // (x*2)+1, not (x+1)*2
    assert(pipe.names == Seq("double", "inc"))
    val extended = pipe.andThen("neg")(_.withColumn("x", -$"x"))
    assert(extended(Seq(1).toDF("x")).as[Int].head() == -3)
  }

  test("pipeline_upsert applies U/D/I in one pass: deletes vanish, inserts appear, updates move cents-exact") {
    val out = graft.pipeline.Pipelines.upsertMerge(spark, SparkSpec.sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byKey = out.map(t => t._1 -> t).toMap
    val base = graft.io.Tables.t(spark, SparkSpec.sfDir, "customer")
      .select($"c_custkey", round($"c_acctbal" * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    base.keys.foreach { k =>
      if (k % 3 == 0 && k % 7 == 0)
        assert(!byKey.contains(k), s"deleted key $k survived")       // D
      else if (k % 3 == 0) {
        assert(byKey(k)._3 == "U")
        assert(byKey(k)._2 == (base(k) + 10000L).toDouble / 100)     // U: +$100 exact
      } else assert(byKey(k)._3 == "-" && byKey(k)._2 == base(k).toDouble / 100)
      if (k % 5 == 1) assert(byKey(k + 1000000L)._3 == "I")          // I
    }
    // every output key is base-or-inserted; nothing invented
    assert(out.forall(t => base.contains(t._1) || base.contains(t._1 - 1000000L)))
  }

  test("profile_columns keeps the Expand-based multi-distinct hash-aggregated (no sorted ×6 intermediate)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = graft.pipeline.Pipelines.profileColumns(spark, SparkSpec.sfDir)
    // AdaptiveSparkPlanExec is a leaf to TreeNode traversal; unwrap it
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collectLeaves().size == 2,
      "two column-pruned scans: counts+distincts (hash path) and string min/max (separate global pass)")
    assert(plan.find(_.nodeName.contains("Expand")).isDefined,
      "multi-column countDistinct should plan as a single Expand, not per-column scans")
    // the round-6 regression this shape guards: string min/max buffers
    // inside the distinct rewrite demote it to SortAggregate, which
    // sorts the ×6 Expand intermediate three times (3.0 s vs 0.6 s)
    val sortAggsOverExpand = plan.collect {
      case p if p.nodeName.contains("SortAggregate") &&
        p.find(_.nodeName.contains("Expand")).isDefined => p
    }
    assert(sortAggsOverExpand.isEmpty,
      "the distinct-rewrite aggregate over the Expand must stay HashAggregate")
    val prof = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = graft.io.Tables.t(spark, SparkSpec.sfDir, "orders").count()
    assert(prof("o_orderkey") == (0L, n), "orderkey is a unique non-null key")
    assert(prof("o_orderstatus")._2 <= 3L)
  }

  test("pipeline_upsert_partitioned rewrites ONLY the dirty partitions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_upsert_part_spec").toString
    graft.pipeline.Pipelines.upsertPartBase(spark, SparkSpec.sfDir, root)
    def snapshot(): Map[String, Set[(String, Long)]] =
      new java.io.File(root).listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet)
        .toMap
    val before = snapshot()
    assert(before.keySet.map(_.stripPrefix("seg=")) ==
      Set("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
    graft.pipeline.Pipelines.upsertPartApply(spark, SparkSpec.sfDir, root)
    val after = snapshot()
    val dirty = Set("seg=BUILDING", "seg=MACHINERY")
    // clean partitions: the exact same physical files, untouched
    (before.keySet -- dirty).foreach { seg =>
      assert(after(seg) == before(seg), s"clean partition $seg was rewritten")
    }
    // dirty partitions: fully replaced (dynamic overwrite), none of
    // the original files survive
    dirty.foreach { seg =>
      assert(after(seg).map(_._1).intersect(before(seg).map(_._1)).isEmpty,
        s"dirty partition $seg kept stale files")
    }
    // and the merged world matches the straight full-outer merge
    // restricted to... the oracle hash does the value check; here just
    // sanity-check the delete/insert arithmetic landed
    val out = spark.read.parquet(root)
    val nBase = graft.io.Tables.t(spark, SparkSpec.sfDir, "customer").count()
    val deleted = out.where($"key" % 3 === 0 && $"key" % 7 === 0 &&
      $"key" < 1000000L && $"seg".isin("BUILDING", "MACHINERY")).count()
    assert(deleted == 0, "deleted keys survived the scoped merge")
    assert(out.where($"key" >= 1000000L).count() > 0, "inserts missing")
    assert(out.count() < nBase + out.where($"key" >= 1000000L).count(),
      "deletes did not shrink the table")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("a late-stage filter pushes down through earlier stages to the scan") {
    val pipe = Pipeline(
      "project" -> (_.select($"l_orderkey", $"l_quantity", $"l_returnflag")),
      "compute" -> (_.withColumn("q2", $"l_quantity" * 2)),
      "filter"  -> (_.where($"l_returnflag" === "R")))
    val df = pipe(graft.io.Tables.t(spark, SparkSpec.sfDir, "lineitem"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    // the stage-3 predicate must appear as a parquet pushed filter on
    // the stage-1 scan — proof the stage boundaries cost nothing
    assert(scan.contains("EqualTo(l_returnflag,R)"), scan.take(800))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_returnflag:string>"),
      scan.take(800))
  }

  test("dq_expect: designed-tight rules fail, invariant rules pass, flags consistent") {
    val rows = graft.pipeline.Pipelines.dqExpect(spark, SparkSpec.sfDir).collect()
    assert(rows.length == 7)
    val byName = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    byName.foreach { case (name, (checked, viol, pass)) =>
      assert(checked > 0, s"$name checked nothing")
      assert(pass == (viol == 0L), s"$name pass flag inconsistent")
    }
    // generator invariants can never fail…
    Seq("li_discount_in_0_01", "li_shipdate_not_null",
        "li_orderkey_fk_orders", "o_orderkey_unique").foreach { n =>
      assert(byName(n)._3, s"$n should pass on generated data")
    }
    // …and the deliberately-tight thresholds must catch real rows
    assert(!byName("li_quantity_in_1_45")._3, "quantity rule designed to fail")
    assert(!byName("li_price_in_1k_100k")._3, "price rule designed to fail")
  }

  test("pipeline_observe: audit counters ride the job and see gated rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant a world with 2 bad rows among 5
    val dir = java.nio.file.Files.createTempDirectory("graft_obs").toString
    Seq((1L, 1, 5.0, 0.1, 100.0, "A"),
        (2L, 1, 0.0, 0.1, 200.0, "A"),   // bad: quantity 0
        (3L, 1, 2.0, -0.5, 300.0, "N"),  // bad: negative discount
        (4L, 1, 3.0, 0.0, 400.0, "N"),
        (5L, 1, 4.0, 0.2, 500.0, "R"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_extendedprice", "l_returnflag")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = graft.pipeline.Pipelines.pipelineObserve(spark, dir)
    val rows = out.collect()
    // gated output drops exactly the 2 bad rows
    assert(rows.map(_.getLong(1)).sum == 3L)
    // the metrics were accumulated on the SAME execution, pre-gate
    val m = out.queryExecution.observedMetrics("graft_audit")
    assert(m.getAs[Long]("rows_seen") == 5L, m.toString)
    assert(m.getAs[Long]("bad_rows") == 2L, m.toString)
  }
}
