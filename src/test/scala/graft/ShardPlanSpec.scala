package graft

import org.apache.spark.sql.functions._

/** Invariants for the corpus manifest operators the DuckDB oracle can't
  * state: the shard plan must actually BALANCE, and the span forensics
  * must agree with the doc-level contamination flags they refine.
  */
class ShardPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q194 serpentine shard plan balances docs and tokens and conserves both") {
    val rows = operators.CorpusOps.q194.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.map(_._1).toSeq shouldBe (0L until operators.CorpusOps.ShardCount)
    // docs stripe evenly: counts differ by at most one
    val counts = rows.map(_._2)
    counts.max - counts.min should be <= 1L
    // conservation: shard sums add up to the corpus totals
    val toks = graft.core.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n"))
      .agg(sum("n"), count(lit(1))).head()
    rows.map(_._3).sum shouldBe toks.getLong(0)
    counts.sum shouldBe toks.getLong(1)
    // balance: serpentine striping over the size-descending order keeps
    // every shard within one largest-document of every other
    val sums = rows.map(_._3)
    val maxDoc = rows.map(_._4).max
    (sums.max - sums.min) should be <= maxDoc
    // ppm shares land near the even split (1e6 / ShardCount)
    val even = 1000000L / operators.CorpusOps.ShardCount
    rows.map(_._5).foreach(p => math.abs(p - even) should be <= even / 5)
  }

  test("q196 writes the planned shards: N partition dirs, one file each, balanced") {
    val storeRoot = tempDir("graft-shardwrite")
    try {
      val st = new graft.sources.TableStore(spark, storeRoot.toString)
      operators.CorpusOps.writeShards(st,
        operators.CorpusOps.shardPlan(spark, dir, payload = Seq("source", "text")))
      // physical layout: exactly ShardCount shard=K partition directories
      val tableDir = java.nio.file.Paths.get(storeRoot.toString, "shards")
      import scala.jdk.CollectionConverters._
      val partDirs = java.nio.file.Files.walk(tableDir).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("shard="))
        .toSeq
      partDirs.map(_.getFileName.toString).sorted shouldBe
        (0L until operators.CorpusOps.ShardCount).map(k => s"shard=$k").sorted
      // one writer per shard → one data file per shard directory
      def filesOf(p: java.nio.file.Path) =
        java.nio.file.Files.list(p).iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq
      partDirs.foreach(p => filesOf(p).size shouldBe 1)
      // byte balance: token-balanced striping keeps file sizes close;
      // allow slack for row-group framing on a tiny corpus
      val bytes = partDirs.map(p => filesOf(p).map(java.nio.file.Files.size(_)).sum)
      bytes.max.toDouble / bytes.min.toDouble should be < 2.0
      // the written rows ARE the plan: per-shard (docs, tokens) from the
      // files equals the q194 manifest
      val written = st.table("shards")
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val manifest = operators.CorpusOps.q194.build(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      written shouldBe manifest
    } finally operators.EventsOps.rmTree(storeRoot)
  }

  test("q195 span forensics flags exactly q63's docs with consistent counts") {
    val spans = operators.CorpusOps.q195.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val flagged = operators.CorpusOps.q63.build(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    spans.map(_._1).toSet shouldBe flagged
    spans.foreach { case (_, firstPos, firstGram, nHits, nGrams) =>
      firstPos should be >= 1L
      firstGram.split(" ").length shouldBe 8
      nHits should be >= nGrams
      nGrams should be >= 1L
    }
    spans.length should be > 0
  }
}
