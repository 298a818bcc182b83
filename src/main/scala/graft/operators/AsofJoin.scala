package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** As-of join — an operator Spark has no primitive for, built the way the
  * brief prefers (compose existing ops before custom plans): tag both
  * streams, union, and take a running `last(..., ignoreNulls)` over a
  * (user, time)-ordered window. One shuffle on user_id; state per user is
  * a single struct — the same shape DuckDB's native ASOF JOIN (the oracle
  * here) and kdb's aj implement natively.
  *
  * Tie semantics: a click at exactly the purchase timestamp matches
  * (ASOF `>=`), reproduced by sorting clicks before purchases on ties.
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

  val all: Seq[QueryDef] = Seq(q65)
}
