package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup}
import graft.core.Tables

/** Plan-shape assertions for the two r11 scale commitments (VERDICT r11
  * next #2/#6):
  *
  *  1. q199's per-epoch dedup kernel: STORE-PROPORTIONAL ROWS NEVER ENTER
  *     A SHUFFLE EXCHANGE. Every scan of the persisted signature state
  *     must stream into the probe side of a BroadcastHashJoin (the batch
  *     bands / candidate-id broadcasts) before any Exchange — per-epoch
  *     shuffle volume is batch/candidate-bounded, so epoch cost tracks
  *     batch size, not accumulated corpus history.
  *
  *  2. q194/q196/q197's shared [[CorpusOps.globalRowIndex]]: exactly ONE
  *     range exchange supplies the order-aligned buckets, and the only
  *     unpartitioned window runs over the ≤64-row per-bucket offsets
  *     aggregate — never over corpus-cardinality rows.
  */
class IncrementalPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Plan lines with their tree depth (indent column of the node name). */
  private def planLines(plan: String): Seq[(Int, String)] =
    plan.linesIterator.toSeq.map { l =>
      val name = l.indexWhere(c => !" +-:*()".contains(c))
      (if (name < 0) l.length else name, l)
    }

  /** Ancestor lines of line `i` (nearest-enclosing first): the preceding
    * lines whose indent strictly decreases. */
  private def ancestors(lines: Seq[(Int, String)], i: Int): Seq[String] = {
    var depth = lines(i)._1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = i - 1
    while (j >= 0) {
      if (lines(j)._1 < depth) { out += lines(j)._2; depth = lines(j)._1 }
      j -= 1
    }
    out.toSeq
  }

  /** Store FileScan nodes of a physical plan with their ancestor chains
    * (nearest first). Tree traversal, not string parsing: cached subtrees
    * hide behind InMemoryTableScanExec LEAVES, so a scan found here is one
    * this plan would actually execute from disk. Run with AQE off so the
    * executed plan is a plain tree (AdaptiveSparkPlanExec is a leaf that
    * would hide everything). */
  private def liveStoreScans(p: org.apache.spark.sql.execution.SparkPlan,
      root: String): Seq[(org.apache.spark.sql.execution.SparkPlan,
                          List[org.apache.spark.sql.execution.SparkPlan])] = {
    def walk(n: org.apache.spark.sql.execution.SparkPlan,
        path: List[org.apache.spark.sql.execution.SparkPlan])
        : Seq[(org.apache.spark.sql.execution.SparkPlan,
               List[org.apache.spark.sql.execution.SparkPlan])] = {
      val here = n match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains(root)) =>
          Seq((n, path))
        case _ => Nil
      }
      here ++ n.children.flatMap(c => walk(c, n :: path))
    }
    walk(p, Nil)
  }

  test("q199 epoch kernel: 2 broadcast-pruned store scans; pairs read caches only") {
    val st = new sources.TableStore(spark, tempDir("graft-planstate").toString)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.buildDedupState(st, docs.filter(col("doc_id") % 3 =!= 0))
    val batch = docs.filter(col("doc_id") % 3 === 0).limit(200)
    val (newSig, newTh) = Dedup.signatureFrames(batch)
    newSig.persist(); newTh.persist()
    val stored = st.table("state")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // A. shape mode (no caching): the raw dataflow consults the store a
      // FIXED number of times — cand0 once (stored band keys + sizes via
      // bandsN); candTh twice (its own stored-hash leg + one cand0 copy
      // under the candDocs broadcast build; Catalyst pushes the semi-join
      // through the stored∪batch union but ReuseExchange dedups the second
      // broadcast copy) — and EVERY store scan hits a BroadcastHashJoin
      // probe side (candidate pruning) before any exchange. In the
      // materialized kernel the cand0 copy reads its cache, so per-epoch
      // DISK scans of the store are exactly 2 (one per intermediate
      // build).
      val shape = Dedup.incrementalLshKernel(spark,
        Dedup.stateSig(stored), Dedup.stateTh(stored), newSig, newTh,
        materialize = false)
      def check(df: org.apache.spark.sql.DataFrame, expectScans: Int): Unit = {
        val plan = df.queryExecution.executedPlan
        val scans = liveStoreScans(plan, st.rootDir)
        withClue(s"plan:\n$plan\n") { scans.size shouldBe expectScans }
        scans.foreach { case (_, path) =>
          // first join/exchange boundary above the scan must be the probe
          // side of a broadcast join: a shuffle would move store-
          // proportional rows, a BroadcastExchange would collect them
          val boundary = path.find {
            case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
            case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
            case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => true
            case _ => false
          }
          withClue(s"boundary above store scan was $boundary in:\n$plan\n") {
            boundary.exists(
              _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
              .shouldBe(true)
          }
        }
      }
      check(shape.cand0, 1)
      check(shape.candTh, 2)
      // the r12 blind spot (VERDICT r12 #2): the UNMATERIALIZED pairs plan
      // re-executes those subtrees — 3+ live store scans per action (vs 2
      // one-time builds in the materialized kernel, and 0 in the pairs job
      // itself). The materialized kernel must never expose this plan.
      liveStoreScans(shape.pairs.queryExecution.executedPlan, st.rootDir)
        .size should be >= 3

      // B. the real kernel: intermediates are persisted (cand0 force-
      // materialized under the guard count), so the pairs job executes
      // ZERO live store scans — all store access happens at the 2
      // intermediate builds. This is the assertion that fails on the r12
      // kernel.
      val k = Dedup.incrementalLshKernel(spark,
        Dedup.stateSig(stored), Dedup.stateTh(stored), newSig, newTh)
      try {
        Seq(k.cand0, k.candTh).foreach(
          _.storageLevel should not be org.apache.spark.storage.StorageLevel.NONE)
        k.pairs.collect()
        val plan = k.pairs.queryExecution.executedPlan
        withClue(s"plan:\n$plan\n") {
          liveStoreScans(plan, st.rootDir) shouldBe empty
        }
      } finally k.release()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      newSig.unpersist(); newTh.unpersist(); ()
    }
  }

  test("globalRowIndex: one range exchange; the unpartitioned window sees ≤64 rows") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    // bucket leg (pre-checkpoint): exactly ONE exchange, and it is the
    // range partitioning — no hash shuffle, no global sort
    val bucketPlan = CorpusOps.rangeBuckets(toks, col("n_tokens").desc, col("doc_id"))
      .queryExecution.executedPlan.toString
    bucketPlan.sliding("Exchange rangepartitioning".length)
      .count(_ == "Exchange rangepartitioning") shouldBe 1
    bucketPlan should not include "Exchange hashpartitioning"
    // full index: the only unpartitioned window (global running offset)
    // must consume the per-bucket counts aggregate — 64 rows, never the
    // corpus — and the per-row window must be partitioned by bucket
    val idx = CorpusOps.globalRowIndex(toks, col("n_tokens").desc, col("doc_id"))
    idx.collect()
    val plan = idx.queryExecution.executedPlan.toString
    val lines = planLines(plan)
    val windows = lines.indices.filter { i =>
      val (depth, l) = lines(i)
      depth < l.length && l.substring(depth).startsWith("Window ")
    }
    windows should not be empty
    windows.foreach { i =>
      val (depth, l) = lines(i)
      if (l.contains("sum(__bn")) {
        // global-offset window: child subtree is the ≤64-row aggregate
        val sub = lines.drop(i + 1).takeWhile(_._1 > depth).map(_._2)
        withClue(s"offsets window subtree:\n$plan\n") {
          sub.exists(_.contains("HashAggregate")) shouldBe true
        }
      } else {
        // the in-bucket row_number window must be partitioned (by __b)
        l should include("row_number()")
        l should include("windowspecdefinition(__b")
      }
    }
  }
}
