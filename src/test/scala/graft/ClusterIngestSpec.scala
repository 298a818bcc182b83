package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupClusters}
import graft.sources.TableStore

/** Incremental near-dup cluster maintenance (q203): component labels kept
  * current per ingest epoch on the kind-tagged signature store — kind 4
  * label rows, kind 5 absorbed-component mappings — with members of an
  * absorbed component re-pointed by ONE mapping row instead of rewritten,
  * and readback resolving the mapping closure.
  *
  * The corpus is built so the cluster graph exercises the hard shapes:
  *   X ~ Z ~ Y at >= 0.8 Jaccard while X !~ Y (a later Z BRIDGES the two
  *   stored clusters), and Y2 ~ Y only (a member the bridge never touches,
  *   so its label is stale on disk and must resolve through the chain). */
class ClusterIngestSpec extends SparkSpec {
  import spark.implicits._

  private def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d")
  private val core = words("core", 45).mkString(" ")
  // shingle math (3-gram shingles of distinct tokens): |Z|=43, |X|=|Y|=49,
  // |Y2|=55; J(Z,X)=J(Z,Y)=43/49≈0.88 (bridge pairs), J(X,Y)=43/55≈0.78
  // (below threshold — the clusters are genuinely separate), J(Y,Y2)=
  // 49/55≈0.89 (Y2 joins Y's cluster), J(Z,Y2)=43/55≈0.78 (the bridge
  // never touches Y2).
  private val textX = core + " " + words("alpha", 6).mkString(" ")
  private val textY = core + " " + words("beta", 6).mkString(" ")
  private val textY2 = textY + " " + words("gamma", 6).mkString(" ")
  private val textZ = core

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def labelMap(st: TableStore): Map[Long, Long] =
    Dedup.clusterLabels(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def kind4Raw(st: TableStore, id: Long): Seq[Long] =
    st.table("state").filter(col("kind") === 4 && col("doc_id") === id)
      .select("h").as[Long].collect().toSeq.sorted

  test("a later doc bridges two stored clusters; the absorbed component re-points via one mapping row") {
    val st = new TableStore(spark, tempDir("graft-cluster").toString)
    Dedup.buildDedupState(st, docsDf().limit(0))

    // epoch 0: two mutually dissimilar seeds — no pairs, no labels
    Dedup.clusterIngestEpoch(st)(docsDf(10L -> textX, 20L -> textY), 0L)
    labelMap(st) shouldBe empty

    // epoch 1: each seed gains a near-dup — two separate clusters
    Dedup.clusterIngestEpoch(st)(docsDf(30L -> textX, 22L -> textY2), 1L)
    labelMap(st) shouldBe Map(10L -> 10L, 30L -> 10L, 20L -> 20L, 22L -> 20L)

    // epoch 2: Z is a near-dup of BOTH X and Y (but not Y2) — the two
    // clusters merge through the new doc; component 20 is absorbed by a
    // mapping row, and untouched member 22 keeps its stale kind-4 row
    Dedup.clusterIngestEpoch(st)(docsDf(50L -> textZ), 2L)
    labelMap(st) shouldBe
      Map(10L -> 10L, 30L -> 10L, 20L -> 10L, 22L -> 10L, 50L -> 10L)
    val maps = Dedup.stateMappings(st.table("state"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    maps should contain(20L -> 10L)
    // the untouched member was never rewritten: its only stored label is
    // still the absorbed component — the mapping, not a rewrite, re-points it
    kind4Raw(st, 22L) shouldBe Seq(20L)

    // epoch 3: a SMALLER id arrives as another bridge copy — the merged
    // cluster re-roots at 5, absorbing component 10; doc 22 now resolves
    // through the 2-hop chain 20 -> 10 -> 5 without any row of its own
    Dedup.clusterIngestEpoch(st)(docsDf(5L -> textZ), 3L)
    val after = labelMap(st)
    after.values.toSet shouldBe Set(5L)
    after.keySet shouldBe Set(5L, 10L, 20L, 22L, 30L, 50L)
    Dedup.stateMappings(st.table("state"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet should
      contain.allOf(20L -> 10L, 10L -> 5L)
    kind4Raw(st, 22L) shouldBe Seq(20L)
  }

  test("compaction collapses multi-hop mapping chains to single hops without changing labels") {
    val st = new TableStore(spark, tempDir("graft-cluster-chainfold").toString)
    Dedup.buildDedupState(st, docsDf().limit(0))
    // build the 2-hop chain 20 -> 10 -> 5 (the bridge shape above)
    Dedup.clusterIngestEpoch(st)(docsDf(10L -> textX, 20L -> textY), 0L)
    Dedup.clusterIngestEpoch(st)(docsDf(30L -> textX, 22L -> textY2), 1L)
    Dedup.clusterIngestEpoch(st)(docsDf(50L -> textZ), 2L)
    Dedup.clusterIngestEpoch(st)(docsDf(5L -> textZ), 3L)
    def mapSet = Dedup.stateMappings(st.table("state"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    mapSet should contain.allOf(20L -> 10L, 10L -> 5L) // genuinely chained
    val before = labelMap(st)
    before.values.toSet shouldBe Set(5L)

    Dedup.compactSignatureStore(st)
    // every surviving mapping row points STRAIGHT at the chain root —
    // resolution is single-hop from here on, which is exactly the remedy
    // the non-convergence error message prescribes
    val folded = mapSet
    folded.map(_._2) shouldBe Set(5L)
    folded.map(_._1) should contain.allOf(10L, 20L)
    // labels unchanged; the untouched member still has only its stale
    // kind-4 row and resolves through the (now 1-hop) mapping
    labelMap(st) shouldBe before
    kind4Raw(st, 22L) shouldBe Seq(20L)
    // and later epochs keep maintaining over the folded store
    Dedup.clusterIngestEpoch(st)(docsDf(60L -> textZ), 4L)
    val after = labelMap(st)
    after(60L) shouldBe 5L
    after.values.toSet shouldBe Set(5L)
  }

  test("a committed epoch replays as a no-op and maintenance compaction changes nothing") {
    val st = new TableStore(spark, tempDir("graft-cluster-replay").toString)
    Dedup.buildDedupState(st, docsDf().limit(0))
    Dedup.clusterIngestEpoch(st)(docsDf(10L -> textX, 20L -> textY), 0L)
    Dedup.clusterIngestEpoch(st)(docsDf(30L -> textX, 22L -> textY2), 1L)
    val before = labelMap(st)
    before shouldBe Map(10L -> 10L, 30L -> 10L, 20L -> 20L, 22L -> 20L)
    val rows = st.table("state").count()

    // replay: the ledger guard must no-op before any LSH work
    Dedup.clusterIngestEpoch(st)(docsDf(30L -> textX, 22L -> textY2), 1L)
    st.table("state").count() shouldBe rows
    labelMap(st) shouldBe before

    // layout-restoring maintenance must never change the clustering, and
    // later epochs must keep maintaining labels over the compacted store
    Dedup.compactSignatureStore(st)
    labelMap(st) shouldBe before
    Dedup.clusterIngestEpoch(st)(docsDf(50L -> textZ), 2L)
    labelMap(st).values.toSet shouldBe Set(10L)
  }

  test("a live stream maintains cluster labels through the foreachBatch sink") {
    implicit val sqlCtx = spark.sqlContext
    val st = new TableStore(spark, tempDir("graft-cluster-stream").toString)
    Dedup.buildDedupState(st, docsDf().limit(0))
    // the card sidecar rides the same sink (the q214 shape): stamp a
    // typed per-doc row per arriving doc on the card table's own ledger
    val cardOf = (b: org.apache.spark.sql.DataFrame) => b.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("ntok"))
    st.create("livecard", cardOf(docsDf().limit(0)))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ckpt = tempDir("graft-cluster-ckpt").toString
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(graft.streaming.DedupIngest.clusterIngestSink(st,
        card = Some("livecard" -> cardOf)))
      .start()
    try {
      input.addData(10L -> textX, 20L -> textY, 30L -> textX, 22L -> textY2)
      q.processAllAvailable()
      labelMap(st) shouldBe Map(10L -> 10L, 30L -> 10L, 20L -> 20L, 22L -> 20L)
      // card rows are already visible mid-stream
      st.table("livecard").count() shouldBe 4L
      // the bridge arrives on a later micro-batch: stored clusters merge
      input.addData(50L -> textZ)
      q.processAllAvailable()
      labelMap(st).values.toSet shouldBe Set(10L)
      st.table("livecard").count() shouldBe 5L
      st.table("livecard").groupBy("doc_id").count()
        .filter(col("count") > 1).count() shouldBe 0L
    } finally q.stop()
  }

  test("the auto-compaction policy fires mid-ingest without changing the clustering") {
    val st = new TableStore(spark, tempDir("graft-cluster-policy").toString)
    Dedup.buildDedupState(st, docsDf().limit(0))
    val confKey = "spark.graft.state.autoCompactVersions"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "3")
    try {
      Dedup.clusterIngestEpoch(st)(docsDf(10L -> textX, 20L -> textY), 0L)
      Dedup.clusterIngestEpoch(st)(docsDf(30L -> textX, 22L -> textY2), 1L)
      Dedup.clusterIngestEpoch(st)(docsDf(50L -> textZ), 2L)
      Dedup.clusterIngestEpoch(st)(docsDf(5L -> textZ), 3L)
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    // the POLICY (not the test) collapsed the chain at least once, and
    // the maintained clustering is byte-for-byte the no-compaction one
    st.chainLength("state") should be < 4
    val after = labelMap(st)
    after.values.toSet shouldBe Set(5L)
    after.keySet shouldBe Set(5L, 10L, 20L, 22L, 30L, 50L)
  }

  test("incremental maintenance reproduces the monolithic q71 fixpoint on real data") {
    val dir = "/root/testdata/sf0.001"
    val inc = DedupClusters.q203.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val mono = DedupClusters.q71.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    inc should not be empty
    inc.toSeq shouldBe mono.toSeq
  }

  test("maintained canonical election matches the monolithic q156 without re-reading corpus text") {
    val dir = "/root/testdata/sf0.001"
    val inc = DedupClusters.q204.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    val mono = DedupClusters.q156.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    inc should not be empty
    inc.toSeq shouldBe mono.toSeq
  }

  test("maintained savings report matches the monolithic q181 from store state alone") {
    val dir = "/root/testdata/sf0.001"
    val inc = DedupClusters.q205.build(spark, dir).collect().map(_.toSeq)
    val mono = DedupClusters.q181.build(spark, dir).collect().map(_.toSeq)
    inc.length shouldBe 1
    inc.toSeq shouldBe mono.toSeq
  }

  test("maintained dataset card matches the monolithic q198 from the card sidecar alone") {
    val dir = "/root/testdata/sf0.001"
    val inc = DedupClusters.q214.build(spark, dir)
    inc.collect().map(_.toSeq).toSeq shouldBe
      graft.operators.CorpusOps.q198.build(spark, dir).collect().map(_.toSeq).toSeq
    // plan purity: the card aggregate reads only store files
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def walk(p: SparkPlan): Seq[String] = {
      val self = p match {
        case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => Nil
      }
      self ++ nested ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
    }
    val paths = walk(inc.queryExecution.executedPlan)
    paths should not be empty
    all(paths) should include("graft-cluster-ingest")
  }

  test("q224/q225: the writeStream-driven cluster store serves q71's labels and q198's card") {
    val dir = "/root/testdata/sf0.001"
    val labels = DedupClusters.streamedClusterServe(
      rowsPerFile = 200L, slices = 3, sinkName = "spec_q224_sink")(spark, dir)(st =>
      graft.operators.Dedup.clusterLabels(st)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val mono = DedupClusters.q71.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    labels should not be empty
    labels.toSeq shouldBe mono.toSeq
    val card = DedupClusters.streamedClusterServe(
      rowsPerFile = 200L, slices = 3, sinkName = "spec_q225_sink")(spark, dir)(st =>
      graft.operators.CorpusOps.datasetCard(
        st.table("card").select("source", "lang", "n_chars", "ntok")))
      .collect().map(_.toSeq)
    val monoCard = graft.operators.CorpusOps.q198.build(spark, dir)
      .collect().map(_.toSeq)
    card.toSeq shouldBe monoCard.toSeq
  }

  test("epochPrefixOracle rejects trap oracles loudly instead of mis-rewriting") {
    // happy path: a plain corpus read is redirected
    val ok = DedupClusters.epochPrefixOracle(
      "WITH x AS (SELECT doc_id FROM documents) SELECT * FROM x")
    ok should include("FROM docs_prefix")
    ok should include("docs_prefix AS (")
    // trap 1: no literal corpus read — the replace would silently no-op
    // and the gate would compare a prefix store against the FULL corpus
    val e1 = intercept[IllegalArgumentException] {
      DedupClusters.epochPrefixOracle(
        "WITH x AS (SELECT doc_id FROM documents d2) SELECT * FROM x"
          .replace("FROM documents d2", "FROM main.documents d2"))
    }
    e1.getMessage should include("no 'FROM documents' read")
    // trap 2: the phrase inside a quoted SQL literal — the global
    // replace would rewrite the literal's TEXT, not a corpus read
    val e2 = intercept[IllegalArgumentException] {
      DedupClusters.epochPrefixOracle(
        "WITH x AS (SELECT 'note: FROM documents' AS note FROM documents) SELECT * FROM x")
    }
    e2.getMessage should include("quoted SQL literal")
  }
}
