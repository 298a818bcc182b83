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

  test("q199 epoch kernel: stored state only ever streams into broadcast joins") {
    val st = new sources.TableStore(spark, tempDir("graft-planstate").toString)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    Dedup.buildDedupState(st, docs.filter(col("doc_id") % 3 =!= 0))
    val batch = docs.filter(col("doc_id") % 3 === 0).limit(200)
    val (newSig, newTh) = Dedup.signatureFrames(batch)
    val stored = st.table("state")
    val pairs = Dedup.incrementalLshPairsFrames(spark,
      Dedup.stateSig(stored), Dedup.stateTh(stored),
      newSig.persist(), newTh.persist())
    try {
      pairs.collect() // drive AQE to its final plan
      val plan = pairs.queryExecution.executedPlan.toString
      val lines = planLines(plan)
      val storeScans = lines.indices.filter { i =>
        val l = lines(i)._2
        l.contains("FileScan parquet") && l.contains(st.rootDir)
      }
      storeScans should not be empty // the store is actually consulted
      // for every scan of the stored state: walking up the tree must hit
      // a BroadcastHashJoin (where the stored rows are pruned to
      // candidate volume) BEFORE any shuffle exchange
      storeScans.foreach { i =>
        val firstBoundary = ancestors(lines, i).find(l =>
          l.contains("BroadcastHashJoin") || l.contains("Exchange hashpartitioning")
            || l.contains("Exchange rangepartitioning"))
        withClue(s"store scan at plan line $i:\n$plan\n") {
          firstBoundary.getOrElse("") should include("BroadcastHashJoin")
        }
      }
    } finally { newSig.unpersist(); newTh.unpersist(); () }
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
