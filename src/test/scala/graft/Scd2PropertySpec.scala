package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Adversarial corpora for the SCD2 maintenance gates: the sf0.001 oracle
  * run exercises one data shape, but the refresh logic's hard cases are
  * structural — same-timestamp purchase ties (rank falls to event_id),
  * users with 0/1/exactly-3/more-than-3 purchases, users whose whole
  * history lands in one batch, and users whose open interval closes
  * across the batch boundary. Each seeded corpus pins BOTH maintenance
  * paths (q188 one-shot split, q189 four-slice streamed) row-identical to
  * the windowed from-scratch rebuild. */
class Scd2PropertySpec extends SparkSpec {

  private def rebuild(ev: DataFrame): Seq[org.apache.spark.sql.Row] = {
    val wK = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ch = ev.filter(col("event_type") === "purchase")
      .withColumn("k", row_number().over(wK)).filter(col("k") <= 3)
      .select(col("user_id"), col("k").cast("int").as("tier"),
        col("ts").as("valid_from"))
    val wDim = Window.partitionBy("user_id").orderBy("valid_from", "tier")
    ch.withColumn("valid_to", lead(col("valid_from"), 1).over(wDim))
      .select("user_id", "tier", "valid_from", "valid_to")
      .orderBy("user_id", "tier").collect().toSeq
  }

  private def corpus(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "view", "click", "purchase") // purchase-heavy enough
    val base = 1700000000000000L // µs epoch
    val rows = (1L to 400L).map { id =>
      val user = rnd.nextInt(40).toLong
      // coarse minutes force same-ts ties WITHIN users and across types;
      // the batch cut at fractions of the range lands inside this grid
      val ts = base + rnd.nextInt(2000).toLong * 60000000L
      (id, ts, user, types(rnd.nextInt(types.length)), rnd.nextDouble() * 10)
    }
    import spark.implicits._
    rows.toDF("event_id", "raw_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("raw_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  for (seed <- Seq(7, 42, 1001)) {
    test(s"seed $seed: one-shot and streamed SCD2 maintenance equal the rebuild") {
      val dir = tempDir(s"graft-scd2-prop$seed")
      try {
        val ev = corpus(seed)
        ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
        val truth = rebuild(core.Tables.events(spark, dir.toString))
        truth.size should be > 0
        operators.Warehouse.q188.build(spark, dir.toString)
          .collect().toSeq shouldBe truth
        operators.Warehouse.q189.build(spark, dir.toString)
          .collect().toSeq shouldBe truth
      } finally {
        def rm(p: java.nio.file.Path): Unit = {
          val f = p.toFile
          if (f.isDirectory) { val l = f.listFiles(); if (l != null) l.foreach(c => rm(c.toPath)) }
          java.nio.file.Files.deleteIfExists(p); ()
        }
        rm(dir)
      }
    }
  }
}
