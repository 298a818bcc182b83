package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.core.Tables
import graft.sources.Formats

class FormatsSpec extends SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val tmpDirs = scala.collection.mutable.Buffer[java.nio.file.Path]()
  private def tmp(prefix: String) = {
    val p = tempDir(prefix)
    tmpDirs += p
    p.toString
  }

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmpDirs.foreach { p =>
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    super.afterAll()
  }

  test("JSON round-trip with explicit schema preserves every row and type") {
    val nation = Tables.nation(spark, sf)
    val dir = tmp("graft-json")
    Formats.writeJson(nation, dir)
    val back = Formats.readJson(spark, dir, nation.schema)
    back.schema shouldBe nation.schema
    back.count() shouldBe nation.count()
    back.exceptAll(nation).count() shouldBe 0
    nation.exceptAll(back).count() shouldBe 0
  }

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val customer = Tables.customer(spark, sf)
    val dir = tmp("graft-orc")
    Formats.writeOrc(customer, dir)
    val back = Formats.readOrc(spark, dir)
    back.count() shouldBe customer.count()
    val filtered = back.filter(col("c_mktsegment") === "BUILDING")
    filtered.count() shouldBe customer.filter(col("c_mktsegment") === "BUILDING").count()
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("c_mktsegment")
  }

  test("file-based streaming source replays a directory and matches the batch rollup") {
    import graft.streaming.EventStream
    // stage a small events slice as the 'landing' directory
    val dir = tmp("graft-stream-src")
    val batchEvents = Tables.events(spark, sf).filter(col("event_id") < 2000)
      .select("ts", "event_type", "value")
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStream.hourlyRollup(stream).writeStream
      .format("memory").queryName("file_hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_hourly")
        .select(col("hour_start"), col("event_type"), col("n_events"))
      val batch = EventStream.hourlyRollup(batchEvents)
        .select(col("hour_start"), col("event_type"), col("n_events"))
      streamed.exceptAll(batch).count() shouldBe 0
      batch.exceptAll(streamed).count() shouldBe 0
      batch.count() should be > 0L
    } finally q.stop()
  }
}
