package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Stage-by-stage timing probe for the q75 curation pipeline on a replica
  * dir — attributes the 100× wall to dedup / tokenize / punct / scoring
  * so the fix targets the real term. Diagnostic main, like [[Probe112]]. */
object ProbeQ75 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
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
      println(f"[probe-q75] $name -> ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }

    time("scan_only")(docs.agg(sum(length(col("text")))).head().getLong(0))
    time("md5_keeper") {
      docs.groupBy(md5(trim(col("text"))).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).count()
    }
    val keeper = docs.groupBy(md5(trim(col("text"))).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    time("keeper_semi_join")(docs.join(keeper, Seq("doc_id"), "left_semi").count())
    val kept = docs.join(keeper, Seq("doc_id"), "left_semi")
    time("tokens")(kept.select(size(tokens(col("text"))).as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    time("punct")(kept.select(size(regexp_extract_all(col("text"),
        lit("[^a-z0-9 ]"), lit(0))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    time("punct_translate")(kept.select(
        length(translate(col("text"),
          "abcdefghijklmnopqrstuvwxyz0123456789 ", "")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0))
    time("stop_scores") {
      var df = kept.withColumn("t", tokens(col("text")))
      for ((lang, words) <- StopWords)
        df = df.withColumn(s"score_$lang", stopHits("t", words).cast("long"))
      df.agg(sum(StopWords.map { case (l, _) => col(s"score_$l") }.reduce(_ + _)))
        .head().getLong(0)
    }
    time("hash60_sample")(kept.filter(hash60(col("doc_id").cast("string")) % 2 === 0).count())
    time("full_q75")(operators.CorpusOps.q75.build(spark, dir).count())
    spark.stop()
  }
}
