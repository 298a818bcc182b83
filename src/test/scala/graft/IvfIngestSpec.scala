package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.TableStore

/** Maintained IVF index (q208): read-free list appends, the probed-
  * cluster file prune, layout-preserving compaction, and parity with
  * the monolithic q51 probe. */
class IvfIngestSpec extends SparkSpec {
  import spark.implicits._

  test("maintained probe matches the monolithic q51 across epochs and a mid-build compaction") {
    val dir = "/root/testdata/sf0.001"
    val inc = Similarity.q208.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val mono = Similarity.q51.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    inc should not be empty
    inc.toSeq shouldBe mono.toSeq
  }

  test("epochs replay as no-ops and the probe reads only the queried clusters' files") {
    val st = new TableStore(spark, tempDir("graft-ivf-spec").toString)
    val empty = Seq.empty[(Long, Int, Array[Float])].toDF("vec_id", "label", "embedding")
    Similarity.buildIvfStore(st, empty)
    // 4 epochs × 8 vectors across 8 labels, 64 dims, deterministic values
    (0 until 4).foreach { e =>
      val batch = (0 until 8).map { i =>
        val id = e * 8L + i
        (id, (id % 8).toInt,
          Array.tabulate(64)(j => ((id * 31 + j * 7) % 97).toFloat / 97f))
      }.toDF("vec_id", "label", "embedding")
      Similarity.ivfIngestEpoch(st)(batch, e.toLong)
    }
    val rows = st.table("ivf").count()

    // replay of a committed epoch no-ops on the ledger
    Similarity.ivfIngestEpoch(st)(
      Seq((99L, 0, Array.fill(64)(0f))).toDF("vec_id", "label", "embedding"), 3L)
    st.table("ivf").count() shouldBe rows

    // the 2 query vectors land in 2 of the 8 labels, so the probe must
    // schedule strictly fewer files than the snapshot holds (the
    // inverted-list seek is REAL file skipping, not a post-scan filter)
    sys.props("graft.epochTrace") = "1"
    graft.operators.Dedup.skipTrace.clear()
    try {
      val out = Similarity.ivfProbe(st, nQueries = 2, k = 3).collect()
      out should not be empty
      import scala.jdk.CollectionConverters._
      val probe = graft.operators.Dedup.skipTrace.iterator().asScala.toSeq
        .filter(_._1 == "ivf.lists")
      probe should have size 1
      val (_, total, read) = probe.head
      withClue(s"ivf.lists $read/$total: ") { read should be < total }
    } finally {
      sys.props.remove("graft.epochTrace")
      graft.operators.Dedup.skipTrace.clear()
    }

    // layout-preserving compaction: chain collapses, results and the
    // prune both survive
    st.compactClustered("ivf", Seq("kind", "label", "vec_id", "i"), 8)
    val before = Similarity.ivfProbe(st, nQueries = 2, k = 3).collect().toSeq
    sys.props("graft.epochTrace") = "1"
    graft.operators.Dedup.skipTrace.clear()
    try {
      Similarity.ivfProbe(st, nQueries = 2, k = 3).collect().toSeq shouldBe before
      import scala.jdk.CollectionConverters._
      val probe = graft.operators.Dedup.skipTrace.iterator().asScala.toSeq
        .filter(_._1 == "ivf.lists")
      val (_, total, read) = probe.head
      withClue(s"post-compact ivf.lists $read/$total: ") { read should be < total }
    } finally {
      sys.props.remove("graft.epochTrace")
      graft.operators.Dedup.skipTrace.clear()
    }
  }
}
