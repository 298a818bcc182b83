package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial corpora for the two subtlest streaming gates. The sf
  * oracle runs exercise one data shape; these corpora engineer the
  * boundary cases the semantics hinge on:
  *
  *  - q187 (stream-stream LEFT OUTER): matches exactly AT the 1-hour
  *    inclusive bound, purchases 1µs outside it, clicks with several
  *    purchases, purchases with no click, users with clicks only — the
  *    unmatched complement must survive watermark eviction exactly once.
  *  - q183 (late data vs watermark): rows engineered onto both sides of
  *    the `event_id % 7 = 0 AND ts < max − 4h` drop rule, including
  *    late-marked rows exactly AT ts = max − 4h (NOT dropped: the rule
  *    is strict <) and whole windows consisting only of late rows
  *    (which must therefore never be emitted).
  *
  * Each seeded corpus pins the streamed result row-identical to the
  * batch-SQL truth computed inline — the same equivalence the DuckDB
  * gate hashes at sf0.01, here under shapes the test data doesn't
  * contain. */
class StreamGatePropertySpec extends SparkSpec {

  private val hourUs = 3600L * 1000000L
  private val base = 1700000000000000L

  private def corpus(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click", "click", "purchase")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, Double)]()
    var id = 0L
    def add(ts: Long, user: Long, tp: String): Unit = {
      id += 1; rows += ((id, ts, user, tp, rnd.nextDouble() * 10)); ()
    }
    // random bulk, coarse 10-min grid → plenty of ties and shared hours
    (1 to 300).foreach { _ =>
      add(base + rnd.nextInt(300).toLong * 600000000L, rnd.nextInt(25).toLong,
        types(rnd.nextInt(types.length)))
    }
    // engineered join-boundary pairs: exactly +1h (inclusive → match),
    // +1h+1µs (exclusive → unmatched), same-instant (p.ts > c.ts strict →
    // unmatched), multi-purchase clicks, click-only and purchase-only users
    add(base, 100L, "click"); add(base + hourUs, 100L, "purchase")
    add(base, 101L, "click"); add(base + hourUs + 1L, 101L, "purchase")
    add(base, 102L, "click"); add(base, 102L, "purchase")
    add(base, 103L, "click")
    add(base + 1L, 103L, "purchase"); add(base + 2L, 103L, "purchase")
    add(base, 104L, "click")
    add(base + hourUs, 105L, "purchase")
    import spark.implicits._
    rows.toSeq.toDF("event_id", "raw_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("raw_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  /** Rows forced onto the late-rule edge relative to the corpus max M:
    * ids divisible by 7 at ts = M − 4h (strict < ⇒ kept), just inside
    * (dropped), and a lone-window late row (its hour must vanish). */
  private def withLateEdges(ev: DataFrame): DataFrame = {
    import spark.implicits._
    val m = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val extra = Seq(
      (70000L, m - 4 * hourUs, 200L, "view", 1.0),       // at the bound: kept
      (70007L, m - 4 * hourUs - 1L, 201L, "view", 1.0),  // 1µs late: dropped
      (70014L, m - 50 * hourUs, 202L, "view", 1.0),      // lone-window late row
      (70003L, m - 50 * hourUs, 203L, "view", 1.0))      // id not %7: kept
      .toDF("event_id", "raw_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("raw_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    ev.unionByName(extra)
  }

  private def writeDir(ev: DataFrame, tag: String): java.nio.file.Path = {
    val dir = tempDir(s"graft-gateprop-$tag")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def rm(p: java.nio.file.Path): Unit = {
    val f = p.toFile
    if (f.isDirectory) { val l = f.listFiles(); if (l != null) l.foreach(c => rm(c.toPath)) }
    java.nio.file.Files.deleteIfExists(p); ()
  }

  for (seed <- Seq(11, 97)) {
    test(s"seed $seed: q187 left-outer gate equals the batch left join") {
      val dir = writeDir(corpus(seed), s"outer$seed")
      try {
        val ev = core.Tables.events(spark, dir.toString)
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        val truth = c.join(p,
            col("p_user") === col("user_id") &&
              col("p_ts") > col("c_ts") &&
              unix_micros(col("p_ts")) <= unix_micros(col("c_ts")) + hourUs,
            "left_outer")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"), count(col("p_ts")).as("n_matched"),
            (count(lit(1)) - count(col("p_ts"))).as("n_unmatched"))
          .orderBy("user_id").collect().toSeq
        val streamed = operators.EventsOps.q187.build(spark, dir.toString)
          .collect().toSeq
        streamed shouldBe truth
        // the engineered unmatched complement is non-trivial
        truth.count(_.getLong(3) > 0) should be > 0
      } finally rm(dir)
    }

    test(s"seed $seed: q183 late gate equals the batch watermark-rule filter") {
      val dir = writeDir(withLateEdges(corpus(seed)), s"late$seed")
      try {
        val ev = core.Tables.events(spark, dir.toString)
        val m = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
        val truth = ev.filter(!(col("event_id") % 7 === 0 &&
            unix_micros(col("ts")) < m - 4 * hourUs))
          .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(graft.functions.Dec.d4(col("value"))).cast("double").as("value_sum"))
          .orderBy("hour_start", "event_type").collect().toSeq
        val streamed = operators.EventsOps.q183.build(spark, dir.toString)
          .collect().toSeq
        streamed shouldBe truth
        // drops actually happened: survivors count strictly under the corpus
        val survivors = truth.map(_.getLong(2)).sum
        survivors should be < ev.count()
        survivors should be > 0L
      } finally rm(dir)
    }
  }
}
