package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** As-of join and range join — two operators Spark has no primitive for,
  * built the way the brief prefers (compose existing ops before custom
  * plans).
  *
  * As-of: tag both streams, union, and take a running
  * `last(..., ignoreNulls)` over a (user, time)-ordered window. One
  * shuffle on user_id; state per user is a single struct — the same shape
  * DuckDB's native ASOF JOIN (the oracle here) and kdb's aj implement
  * natively.
  *
  * Tie semantics: a click at exactly the purchase timestamp matches
  * (ASOF `>=`), reproduced by sorting clicks before purchases on ties.
  *
  * Range (point-in-interval) join: a naive `ts BETWEEN lo AND hi` theta
  * join is not hash-joinable — Catalyst plans a nested loop over all
  * pairs. The scalable form BINS the time axis: each interval explodes to
  * the hour bins it covers, each point carries its one bin, the join is a
  * plain equi-join on the bin, and the exact range predicate verifies the
  * survivors. Cost O(points + intervals·bins_per_interval + matches).
  */
object AsofJoin {

  val q65 = QueryDef(
    "q65_asof_join",
    """WITH clicks AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |purchases AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, c.event_id AS last_click_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val base = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("click_info",
        when(col("event_type") === "click", struct(col("ts"), col("event_id"))))
    // clicks sort before purchases on timestamp ties → ASOF '>=' semantics
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), (col("event_type") === "purchase").cast("int"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("last_click", last(col("click_info"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("last_click.event_id").as("last_click_id"),
        (unix_micros(col("ts")) - unix_micros(col("last_click.ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** Binned point-in-interval range join: every ~97th event opens a
    * 2-hour interval; find all events inside each interval. The bin
    * equi-join makes this distributable — PlanSpec asserts no nested
    * loop appears. Each event has exactly one bin and an interval covers
    * each bin once, so candidate pairs are already distinct. */
  val q82 = QueryDef(
    "q82_range_join_binned",
    """WITH iv AS (
      |  SELECT event_id AS iv_id, ts AS iv_start, ts + INTERVAL 2 HOUR AS iv_end
      |  FROM events WHERE event_id % 97 = 0)
      |SELECT e.event_id, i.iv_id
      |FROM events e JOIN iv i ON e.ts >= i.iv_start AND e.ts <= i.iv_end
      |ORDER BY event_id, iv_id""".stripMargin) { (s, d) =>
    val hourUs = 3600L * 1000000L
    // floor-division, not truncation: long '/' is double division and
    // cast('long') truncates toward zero, which misbins pre-1970 (negative
    // epoch) timestamps. pmod is non-negative, so the numerator is the
    // largest multiple of hourUs <= us — exact floor for all epochs, and
    // exact in double because |us| < 2^53.
    def hourBin(c: org.apache.spark.sql.Column) = {
      val us = unix_micros(c)
      ((us - pmod(us, lit(hourUs))) / hourUs).cast("long")
    }
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), hourBin(col("ts")).as("bin"))
    val iv = Tables.events(s, d)
      .filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("iv_id"), col("ts").as("iv_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("iv_end"))
      .withColumn("bin", explode(sequence(hourBin(col("iv_start")), hourBin(col("iv_end")))))
    ev.join(iv, Seq("bin"))
      .filter(col("ts") >= col("iv_start") && col("ts") <= col("iv_end"))
      .select(col("event_id"), col("iv_id"))
      .orderBy("event_id", "iv_id")
  }

  val all: Seq[QueryDef] = Seq(q65, q82)
}
