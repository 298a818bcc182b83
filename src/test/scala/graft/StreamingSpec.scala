package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourlyRollup aggregates a stream incrementally (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.hourlyRollup(events).writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      rows.toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0))
    } finally q.stop()
  }

  test("sessionRollup groups by 30-minute session windows per user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = EventStream.sessionRollup(events).writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 7L, 1.0),
        (ts("2024-01-01 10:10:00"), 7L, 1.0),  // same session (gap 10m)
        (ts("2024-01-01 12:00:00"), 7L, 1.0),  // new session (gap 110m)
        (ts("2024-01-01 10:00:00"), 8L, 9.0))
      q.processAllAvailable()
      val byUser = spark.table("sessions").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
      byUser shouldBe Map(7L -> 2, 8L -> 1)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user running aggregates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{UserAgg, UserEvent}
    val input = MemoryStream[UserEvent]
    val q = EventStream.statefulUserAgg(input.toDS()).writeStream
      .format("memory").queryName("stateful").outputMode("update").start()
    try {
      input.addData(UserEvent(1L, 1000L, 2.0), UserEvent(1L, 2000L, 3.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, 3000L, 5.0)) // state carries over
      q.processAllAvailable()
      val last = spark.table("stateful").as[UserAgg].collect()
        .filter(_.user_id == 1L).maxBy(_.n_events)
      last.n_events shouldBe 3L
      last.value_sum shouldBe 10.0 +- 1e-9
      last.last_ts shouldBe 3000L
    } finally q.stop()
  }

  test("funnelStream advances view→click→purchase across batches, strict order, once per stage") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{FunnelAdvance, TypedEvent}
    val input = MemoryStream[TypedEvent]
    val q = EventStream.funnelStream(input.toDS()).writeStream
      .format("memory").queryName("funnel").outputMode("append").start()
    try {
      // purchase BEFORE any view must not count; click after view does
      input.addData(
        TypedEvent(1L, 500L, "purchase"), TypedEvent(1L, 1000L, "view"),
        TypedEvent(1L, 2000L, "click"),
        TypedEvent(2L, 1000L, "click")) // no view yet: stays stage 0
      q.processAllAvailable()
      // state carries across batches: purchase now lands for user 1;
      // a second click must NOT re-emit stage 2
      input.addData(
        TypedEvent(1L, 2500L, "click"), TypedEvent(1L, 3000L, "purchase"),
        TypedEvent(2L, 4000L, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel").as[FunnelAdvance].collect()
      rows.filter(_.user_id == 1L).map(a => (a.reached, a.at_ts)).sorted shouldBe
        Seq((1, 1000L), (2, 2000L), (3, 3000L))
      rows.filter(_.user_id == 2L).map(a => (a.reached, a.at_ts)).sorted shouldBe
        Seq((1, 4000L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "event_id", "value")
    val q = EventStream.dedupeStream(events).writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:01:00"), 2L, 2.0),
        (ts("2024-01-01 10:02:00"), 1L, 1.0)) // replay of event 1
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:00"), 1L, 1.0)) // replayed again, later batch
      q.processAllAvailable()
      spark.table("deduped").collect().map(_.getLong(1)).sorted.toSeq shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits one alert per threshold crossing") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStream.{Threshold, UserEvent}
    val input = MemoryStream[UserEvent]
    val q = EventStream.thresholdAlerts(input.toDS(), step = 10.0).writeStream
      .format("memory").queryName("alerts").outputMode("append").start()
    try {
      input.addData(UserEvent(1L, 1000L, 7.0)) // total 7: no alert
      q.processAllAvailable()
      input.addData(UserEvent(1L, 2000L, 25.0)) // total 32: crosses 10 and 20 and 30
      q.processAllAvailable()
      val alerts = spark.table("alerts").as[Threshold].collect().sortBy(_.threshold)
      alerts.map(_.threshold).toSeq shouldBe Seq(10.0, 20.0, 30.0)
      all(alerts.map(_.at_ts)) shouldBe 2000L
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to prior-hour clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val joined = EventStream.clickToPurchaseJoin(
      clicks.toDF().toDF("click_ts", "click_user", "click_id"),
      purchases.toDF().toDF("purchase_ts", "purchase_user", "purchase_id"))
    val q = joined.writeStream
      .format("memory").queryName("attributed").outputMode("append").start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), 7L, 100L),
        (ts("2024-01-01 08:00:00"), 7L, 101L), // >1h before purchase: no match
        (ts("2024-01-01 10:10:00"), 8L, 102L)) // other user
      purchases.addData((ts("2024-01-01 10:30:00"), 7L, 900L))
      q.processAllAvailable()
      val rows = spark.table("attributed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      rows shouldBe Seq((7L, 100L, 900L))
    } finally q.stop()
  }

  test("the same rollup transform answers batch frames (one codebase)") {
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0)).toDF("ts", "event_type", "value")
    val out = EventStream.hourlyRollup(batch).collect()
    out.length shouldBe 1
    out.head.getLong(2) shouldBe 2L
  }
}
