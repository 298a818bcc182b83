package graft

import org.apache.spark.sql.functions._
import graft.sources.TableStore

/** Retention pins (VERDICT r16 next #1): a pinned version's snapshot
  * outlives vacuum/compaction — time travel and maintenance are no
  * longer mutually exclusive — while unpinned neighbors are still
  * reclaimed on schedule. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, tempDir("graft-retention").toString)

  test("pinned snapshot outlives a compaction that vacuumed its neighbors") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "v"))           // v0
    st.appendBatch("t", 0L, Seq((2L, "b")).toDF("id", "v"))  // v1
    val pinnedV = st.pinVersion("t", "release-1")            // pins v1
    pinnedV shouldBe 1
    st.appendBatch("t", 1L, Seq((3L, "c")).toDF("id", "v"))  // v2
    st.appendBatch("t", 2L, Seq((4L, "d")).toDF("id", "v"))  // v3
    st.compact("t") // publish v4 + analyze: vacuums v0, v2, v3 — NOT v1

    // neighbors reclaimed, the pin survives with exactly its rows
    // (v0 also survives: pinned v1's append manifest stitches v0's dir —
    // a pin keeps precisely the file set its snapshot reads)
    val live = st.liveVersions("t")
    live should contain(pinnedV)
    live should not contain 2
    live should not contain 3
    st.tableAtPin("t", "release-1").orderBy("id")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    // current reads are untouched by the pin
    st.table("t").count() shouldBe 4
  }

  test("pins survive repeated maintenance and a clustered compaction") {
    val st = freshStore()
    st.create("t", (0L until 8L).map(i => (i, i % 3)).toDF("id", "k"))
    st.appendBatch("t", 0L, Seq((100L, 1L)).toDF("id", "k"))
    st.pinVersion("t", "epoch0")
    st.appendBatch("t", 1L, Seq((101L, 2L)).toDF("id", "k"))
    st.compactClustered("t", Seq("k", "id"), minFiles = 2)
    st.appendBatch("t", 2L, Seq((102L, 0L)).toDF("id", "k"))
    st.compactClustered("t", Seq("k", "id"), minFiles = 2)
    st.tableAtPin("t", "epoch0").count() shouldBe 9
    st.table("t").count() shouldBe 11
  }

  test("unpin releases the version to the next vacuum") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "v"))
    st.appendBatch("t", 0L, Seq((2L, "b")).toDF("id", "v"))
    st.pinVersion("t", "tmp")
    st.appendBatch("t", 1L, Seq((3L, "c")).toDF("id", "v"))
    st.compact("t")
    st.tableAtPin("t", "tmp").count() shouldBe 2 // held through the first vacuum
    st.unpinVersion("t", "tmp") shouldBe true
    st.unpinVersion("t", "tmp") shouldBe false // idempotent report
    st.analyze("t")
    an[IllegalArgumentException] should be thrownBy st.tableAt("t", 1)
  }

  test("pins are durable across store handles and validated on creation") {
    val root = tempDir("graft-retention-dur").toString
    val st = new TableStore(spark, root)
    st.create("t", Seq((1L, "a")).toDF("id", "v"))
    st.update("t", col("id") === 1, Map("v" -> lit("z")))
    st.pinVersion("t", "audit", version = 0) shouldBe 0
    // a fresh handle over the same root sees (and honors) the pin
    val st2 = new TableStore(spark, root)
    st2.pinnedVersions("t") shouldBe Map("audit" -> 0)
    st2.update("t", col("id") === 1, Map("v" -> lit("y")))
    st2.analyze("t")
    st2.tableAtPin("t", "audit").head.getString(1) shouldBe "a"
    // pinning a nonexistent / vacuumed version fails loudly
    an[IllegalArgumentException] should be thrownBy st2.pinVersion("t", "bad", version = 1)
    an[IllegalArgumentException] should be thrownBy st2.pinVersion("t", "bad", version = 99)
  }

  test("index pin survives forced policy compactions (q216's build shape)") {
    val docs = (0L until 40L).map(i => (i, s"tok$i dup window common"))
      .toDF("doc_id", "text")
    val st = freshStore()
    graft.operators.SearchOps.buildSearchIndex(st, docs.limit(0))
    (0 until 4).foreach { e =>
      graft.operators.SearchOps.indexIngestEpoch(st, compactLimit = Some(2))(
        docs.filter(col("doc_id") >= e * 10 && col("doc_id") < (e + 1) * 10),
        e.toLong)
      if (e == 1) st.pinVersion("index", "epoch1")
    }
    // the per-epoch policy compaction really ran: the head chain is
    // collapsed, and versions between the pin and the head were vacuumed
    st.chainLength("index") shouldBe 1
    val pinnedV = st.pinnedVersions("index")("epoch1")
    st.liveVersions("index") should contain(pinnedV)
    st.liveVersions("index").size should be < (st.currentVersionOf("index") + 1)
    // the pinned snapshot serves exactly the first two epochs' docs
    graft.operators.SearchOps.bm25FromSnapshot(
      st.tableAtPin("index", "epoch1"), Seq("dup", "window"), 50)
      .collect().map(_.getLong(0)).toSet shouldBe (0L until 20L).toSet
    // the live index serves all four epochs
    graft.operators.SearchOps.bm25FromIndex(st, Seq("dup", "window"), 50)
      .count() shouldBe 40
  }

  test("retainVersions keeps a rolling window of superseded versions") {
    val key = "spark.graft.state.retainVersions"
    spark.conf.set(key, "2")
    try {
      val st = freshStore()
      st.create("t", Seq((0L, "a")).toDF("id", "v")) // v0
      (1 to 5).foreach(i =>
        st.update("t", col("id") === 0L, Map("v" -> lit(s"v$i")))) // v1..v5
      st.analyze("t")
      // the window: v3/v4 (the last 2 superseded) + current v5 readable
      st.tableAt("t", 4).head.getString(1) shouldBe "v4"
      st.tableAt("t", 3).head.getString(1) shouldBe "v3"
      an[IllegalArgumentException] should be thrownBy st.tableAt("t", 2)
      // the window ROLLS: another mutation + vacuum releases v3
      st.update("t", col("id") === 0L, Map("v" -> lit("v6"))) // v6
      st.analyze("t")
      st.tableAt("t", 4).head.getString(1) shouldBe "v4"
      an[IllegalArgumentException] should be thrownBy st.tableAt("t", 3)
    } finally spark.conf.unset(key)
  }

  test("a coordinated release carries paired snapshots through both stores' compactions") {
    import graft.sources.ReleaseCatalog
    val stA = freshStore()
    val stB = freshStore()
    val cat = new ReleaseCatalog(tempDir("graft-relcat").toString, spark)
    stA.create("index", Seq((1L, "a")).toDF("id", "v"))            // A v0
    stA.appendBatch("index", 0L, Seq((2L, "b")).toDF("id", "v"))   // A v1
    stB.create("ivf", Seq((10L, "x")).toDF("id", "v"))             // B v0
    stB.appendBatch("ivf", 0L, Seq((20L, "y")).toDF("id", "v"))    // B v1
    val members = cat.pin("rel-1", Seq((stA, "index"), (stB, "ivf")))
    members.map(_.version) shouldBe Seq(1, 1)
    // further maintenance lands on BOTH stores — each compaction's
    // vacuum reclaims the release's unpinned neighbors
    stA.appendBatch("index", 1L, Seq((3L, "c")).toDF("id", "v"))   // A v2
    stA.compact("index")                                           // A v3 + vacuum
    stB.appendBatch("ivf", 1L, Seq((30L, "z")).toDF("id", "v"))    // B v2
    stB.compact("ivf")                                             // B v3 + vacuum
    stA.liveVersions("index") should not contain 2
    stB.liveVersions("ivf") should not contain 2
    // both legs resolve from ONE record, bit-exact
    cat.tableAt("rel-1", "index").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
    cat.tableAt("rel-1", "ivf").collect().map(_.getLong(0)).sorted shouldBe Array(10L, 20L)
    // unknown label / table fail loudly
    an[IllegalArgumentException] should be thrownBy cat.tableAt("rel-2", "index")
    an[IllegalArgumentException] should be thrownBy cat.tableAt("rel-1", "nope")
    // unpin releases the member pins: the next vacuum on each store
    // reclaims the snapshots, and the release is gone
    cat.unpin("rel-1") shouldBe true
    cat.unpin("rel-1") shouldBe false
    stA.analyze("index"); stB.analyze("ivf")
    stA.liveVersions("index") should not contain 1
    stB.liveVersions("ivf") should not contain 1
    an[IllegalArgumentException] should be thrownBy cat.tableAt("rel-1", "index")
  }

  test("re-pinning a release re-points it and frees the old members' store pins") {
    import graft.sources.ReleaseCatalog
    val st = freshStore()
    val cat = new ReleaseCatalog(tempDir("graft-relcat2").toString, spark)
    st.create("t", Seq((1L, "a")).toDF("id", "v"))          // v0
    cat.pin("nightly", Seq((st, "t")))
    st.appendBatch("t", 0L, Seq((2L, "b")).toDF("id", "v")) // v1
    cat.pin("nightly", Seq((st, "t")))                      // re-point to v1
    cat.releases("nightly").map(_.version) shouldBe Seq(1)
    // exactly ONE store pin remains (the re-point, not an accumulation)
    st.pinnedVersions("t") shouldBe Map("release:nightly" -> 1)
    st.appendBatch("t", 1L, Seq((3L, "c")).toDF("id", "v")) // v2
    st.compact("t") // vacuum: v2 goes (v0's dir survives — pinned v1's
    st.liveVersions("t") should not contain 2 // manifest stitches it)
    cat.tableAt("nightly", "t").count() shouldBe 2
  }

  test("concurrent release pinners never drop each other's records") {
    import graft.sources.ReleaseCatalog
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "v"))
    val cat = new ReleaseCatalog(tempDir("graft-relcat-conc").toString, spark)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 12).map(i =>
        scala.concurrent.Future(cat.pin(s"rel$i", Seq((st, "t")))))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration(120, "s"))
      cat.releases.keySet shouldBe (0 until 12).map(i => s"rel$i").toSet
      // every release's store pin survived the interleaving too
      st.pinnedVersions("t").keySet shouldBe
        (0 until 12).map(i => s"release:rel$i").toSet
    } finally { pool.shutdown(); () }
  }

  test("a release can span several tables of ONE store (the cluster-family shape)") {
    import graft.sources.ReleaseCatalog
    val st = freshStore()
    val cat = new ReleaseCatalog(tempDir("graft-relcat-multi").toString, spark)
    st.create("state", Seq((1L, "s")).toDF("id", "v"))
    st.create("card", Seq((2L, "c")).toDF("id", "v"))
    cat.pin("corpus-release", Seq((st, "state"), (st, "card")))
    st.update("state", col("id") === 1L, Map("v" -> lit("s2")))
    st.update("card", col("id") === 2L, Map("v" -> lit("c2")))
    st.compact("state"); st.compact("card")
    cat.tableAt("corpus-release", "state").head.getString(1) shouldBe "s"
    cat.tableAt("corpus-release", "card").head.getString(1) shouldBe "c"
  }

  test("a torn or non-numeric RELEASES line fails loudly, never a bare parse error") {
    import graft.sources.ReleaseCatalog
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "v"))
    def catWithLine(tag: String, line: String): ReleaseCatalog = {
      val root = tempDir(s"graft-relcat-$tag")
      val cat = new ReleaseCatalog(root.toString, spark)
      cat.pin("ok", Seq((st, "t")))
      java.nio.file.Files.writeString(root.resolve("RELEASES"), line)
      cat
    }
    // torn line (wrong arity) and non-numeric version are the SAME
    // failure class: both must surface the catalog's own message
    for ((tag, bad) <- Seq(
        ("torn", "r1\t/x/store"),
        ("nonnum", "r1\t/x/store\tt\tnot-a-version"),
        ("emptyver", "r1\t/x/store\tt\t"))) {
      val e = the[RuntimeException] thrownBy catWithLine(tag, bad).releases
      withClue(s"$tag: ") {
        e.getMessage should include("corrupt release line")
      }
    }
  }

  test("a release resolves strictly superseded versions after further maintenance") {
    // the q227 serving property in store terms: once maintenance lands
    // after the pin, the release's members are OLDER than every store's
    // current version — the gate really reads history, not the head
    import graft.sources.ReleaseCatalog
    val stA = freshStore()
    val stB = freshStore()
    val cat = new ReleaseCatalog(tempDir("graft-relcat3").toString, spark)
    stA.create("index", Seq((1L, "a")).toDF("id", "v"))
    stB.create("ivf", Seq((10L, "x")).toDF("id", "v"))
    val members = cat.pin("yesterday", Seq((stA, "index"), (stB, "ivf")))
    stA.appendBatch("index", 0L, Seq((2L, "b")).toDF("id", "v"))
    stA.compact("index")
    stB.appendBatch("ivf", 0L, Seq((20L, "y")).toDF("id", "v"))
    stB.compact("ivf")
    members.foreach { m =>
      val cur = new graft.sources.TableStore(spark, m.storeRoot)
        .currentVersionOf(m.table)
      withClue(s"${m.table}: pinned v${m.version} vs current v$cur: ") {
        m.version should be < cur
      }
    }
    // and the resolved reads are the PRE-maintenance snapshots
    cat.tableAt("yesterday", "index").collect().map(_.getLong(0)) shouldBe Array(1L)
    cat.tableAt("yesterday", "ivf").collect().map(_.getLong(0)) shouldBe Array(10L)
  }

  test("retainVersions threads per-call and overrides the session conf") {
    // no conf set: the parameter alone establishes the window
    val st = freshStore()
    st.create("t", Seq((0L, "a")).toDF("id", "v")) // v0
    (1 to 5).foreach(i =>
      st.update("t", col("id") === 0L, Map("v" -> lit(s"v$i")))) // v1..v5
    st.analyze("t", retainVersions = Some(2))
    st.tableAt("t", 4).head.getString(1) shouldBe "v4"
    st.tableAt("t", 3).head.getString(1) shouldBe "v3"
    an[IllegalArgumentException] should be thrownBy st.tableAt("t", 2)
    // the parameter WINS over a conflicting session conf (a store-local
    // lineage policy must not leak into — or read from — global state)
    val key = "spark.graft.state.retainVersions"
    spark.conf.set(key, "4")
    try {
      st.update("t", col("id") === 0L, Map("v" -> lit("v6"))) // v6
      st.analyze("t", retainVersions = Some(1))
      st.tableAt("t", 5).head.getString(1) shouldBe "v5"
      an[IllegalArgumentException] should be thrownBy st.tableAt("t", 4)
    } finally spark.conf.unset(key)
  }

  test("concurrent pinners never drop each other's labels") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 16).map(i =>
        scala.concurrent.Future(st.pinVersion("t", s"pin$i")))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration(120, "s"))
      st.pinnedVersions("t").keySet shouldBe
        (0 until 16).map(i => s"pin$i").toSet
    } finally { pool.shutdown(); () }
  }

  test("pinned partitioned snapshot keeps superseded partition dirs") {
    val st = freshStore()
    st.createPartitioned("t",
      Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p"), "p")
    st.pinVersion("t", "before")
    st.updateWherePruned("t", col("p") === "p1", Map("v" -> lit("z")))
    st.analyze("t")
    // the pinned snapshot still reads the pre-update partition bytes
    st.tableAtPin("t", "before").filter($"p" === "p1")
      .head.getString(1) shouldBe "x"
    st.table("t").filter($"p" === "p1").head.getString(1) shouldBe "z"
  }
}
