package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for q150 (interval-overlap self-join) on a
  * replica dir — attributes its 10× growth (3.63× in scale_r14_10x.json,
  * one of the two worst non-dedup rows) to scan / bin-explode / density
  * guard / checkpoint / candidate join / output stages, with the
  * cardinalities that decide whether the growth is a fixable plan term or
  * the documented quadratic-output design point (pairs grow with per-key
  * interval density squared — the replica multiplies same-key intervals).
  * Diagnostic main, like [[ProbeQ157]]. */
object ProbeQ150 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe-q150] $name -> ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }

    val cellDays = 14L
    def cellOf(c: org.apache.spark.sql.Column) =
      floor(datediff(c, lit("1970-01-01").cast("date")) / cellDays.toDouble).cast("long")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("scan_only")(li.count())
    val iv = li.select(
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
      col("l_suppkey").as("sk"), col("l_partkey").as("pk"),
      col("l_shipdate").cast("date").as("s"),
      date_add(col("l_shipdate").cast("date"),
        (col("l_quantity").cast("long") % 10 + 3).cast("int")).as("e"))
    val binnedPlan = iv.withColumn("cell",
      explode(sequence(cellOf(col("s")), cellOf(col("e")))))
    time("bin_explode")(binnedPlan.count())
    time("density_guard") {
      binnedPlan.groupBy("sk", "pk", "cell")
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    }
    val t0 = System.nanoTime()
    val binned = binnedPlan.localCheckpoint(true)
    println(f"[probe-q150] checkpoint -> ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val a = binned.select(col("sk"), col("pk"), col("cell"), col("ok").as("ok_a"),
      col("ln").as("ln_a"), col("s").as("s_a"), col("e").as("e_a"))
    val b = binned.select(col("sk"), col("pk"), col("cell"), col("ok").as("ok_b"),
      col("ln").as("ln_b"), col("s").as("s_b"), col("e").as("e_b"))
    val cand = a.join(b, Seq("sk", "pk", "cell"))
      .filter(col("ok_a") < col("ok_b") ||
        (col("ok_a") === col("ok_b") && col("ln_a") < col("ln_b")))
    time("candidate_join")(cand.count())
    val pairs = cand
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .groupBy("ok_a", "ln_a", "ok_b", "ln_b", "sk", "pk")
      .agg(first(lit(1)).as("one"))
    time("output_pairs")(pairs.count())
    time("full_q150")(operators.AsofJoin.q150.build(spark, dir).count())
    spark.stop()
  }
}
