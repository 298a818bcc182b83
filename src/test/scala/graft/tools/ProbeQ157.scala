package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Stage-by-stage timing probe for q157 (cross-source containment) on a
  * replica dir — attributes its 10× growth (4.22×, the worst full-surface
  * row in scale_r13_10x.json) to scan / shingle / distinct / self-join
  * stages, and times the collect_set-based rewrite that replaces the
  * corpus-wide self-join on the gram key. Diagnostic main, like
  * [[ProbeQ75]]. */
object ProbeQ157 {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe-q157] $name -> ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }

    time("scan_only")(docs.agg(sum(length(col("text")))).head().getLong(0))
    val grams = docs
      .select(col("source"), tokens(col("text")).as("t"))
      .select(col("source"), explode(shinglesN("t", 5)).as("g"))
    time("shingle_explode")(grams.count())
    val sh = grams.distinct()
    time("distinct_shuffle")(sh.count())
    // the r13-era pipeline: distinct (source, g) self-joined on g — the
    // full shingle set crosses TWO more exchanges as join input
    time("self_join_ix") {
      sh.toDF("source_a", "g")
        .join(sh.toDF("source_b", "g"), Seq("g"))
        .filter(col("source_a") =!= col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
        .count()
    }
    // the rewrite: ONE shuffle on g, per-gram state bounded by |sources|
    val bySrc = grams.groupBy("g").agg(collect_set(col("source")).as("srcs"))
    time("collect_set_agg")(bySrc.count())
    time("pairs_from_sets") {
      bySrc.select(explode(col("srcs")).as("source_a"), col("srcs"))
        .select(col("source_a"), explode(col("srcs")).as("source_b"))
        .filter(col("source_a") =!= col("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
        .count()
    }
    time("full_q157")(operators.CorpusOps.q157.build(spark, dir).count())
    spark.stop()
  }
}
