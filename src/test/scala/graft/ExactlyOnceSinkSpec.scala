package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.TableStore
import graft.streaming.EventStream

/** Exactly-once streaming sink (VERDICT r2 #8): foreachBatch appends into
  * the versioned table store, keyed by epoch id committed atomically with
  * the version pointer — replaying an epoch must never duplicate rows. */
class ExactlyOnceSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("graft-eos").toString)

  test("appendBatch is idempotent per epoch and O(batch) via manifest reuse") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("id", "s"))

    st.appendBatch("t", 0L, Seq((2L, "b")).toDF("id", "s")) shouldBe true
    st.table("t").count() shouldBe 2
    // replay of epoch 0 — crash between sink commit and checkpoint commit
    st.appendBatch("t", 0L, Seq((2L, "b")).toDF("id", "s")) shouldBe false
    st.table("t").count() shouldBe 2
    st.appendBatch("t", 1L, Seq((3L, "c")).toDF("id", "s")) shouldBe true
    st.table("t").count() shouldBe 3
    // prior versions' files are REUSED, not rewritten: v1 holds only its
    // batch; the manifest stitches v0..v2 together
    st.table("t").orderBy("id").select("id").as[Long].collect().toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("interleaved DML carries the ledger: replays still no-op afterwards") {
    val st = freshStore()
    st.create("t", Seq((1L, 10.0)).toDF("id", "x"))
    st.appendBatch("t", 7L, Seq((2L, 20.0)).toDF("id", "x")) shouldBe true
    // a full-rewrite UPDATE between epochs flips a fresh version; the
    // committed-batch ledger must survive the flip
    st.update("t", org.apache.spark.sql.functions.col("id") === 1L,
      Map("x" -> org.apache.spark.sql.functions.lit(11.0)))
    st.appendBatch("t", 7L, Seq((2L, 20.0)).toDF("id", "x")) shouldBe false
    st.table("t").count() shouldBe 2
    st.table("t").filter($"x" === 11.0).count() shouldBe 1
    // vacuum keeps the current ledger, drops superseded sidecars, data intact
    st.analyze("t")
    st.appendBatch("t", 7L, Seq((2L, 20.0)).toDF("id", "x")) shouldBe false
    st.table("t").count() shouldBe 2
  }

  test("a real stream through exactlyOnceSink lands each epoch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val st = freshStore()
    st.create("ev", Seq.empty[(Timestamp, Long, Double)].toDF("ts", "user_id", "value"))

    val input = MemoryStream[(Timestamp, Long, Double)]
    val ckpt = Files.createTempDirectory("graft-eos-ckpt").toString
    val q = input.toDF().toDF("ts", "user_id", "value").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(EventStream.exactlyOnceSink(st, "ev"))
      .start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 10:01:00"), 2L, 2.0),
        (Timestamp.valueOf("2024-01-01 10:02:00"), 3L, 3.0))
      q.processAllAvailable()
      st.table("ev").count() shouldBe 3
      // simulate the restart-replay of the final epoch: Structured
      // Streaming re-invokes foreachBatch with the SAME epoch id when the
      // sink committed but the checkpoint didn't — must be a no-op
      val lastEpoch = q.lastProgress.batchId
      EventStream.exactlyOnceSink(st, "ev")(
        Seq((Timestamp.valueOf("2024-01-01 10:02:00"), 3L, 3.0)).toDF("ts", "user_id", "value"),
        lastEpoch)
      st.table("ev").count() shouldBe 3
    } finally q.stop()
  }
}
