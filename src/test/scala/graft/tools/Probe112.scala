package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.TextFunctions._

/** Stage-wise cost probe for q112's prefix-filter join (diagnostic main,
  * not part of the driver contract): counts + wall time per pipeline
  * stage so scale work targets the stage that actually pays. */
object Probe112 {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/tmp/graft_sf100"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs  $r")
      r
    }

    val sh = Tables.documents(spark, d)
      .withColumn("t", tokens(col("text")))
      .withColumn("s", explode(shingles3("t")))
      .select("doc_id", "s").distinct()
      .cache()
    timed("shingles")(sh.count())

    val freq = sh.groupBy("s").agg(count(lit(1)).as("__cnt"))
    val ranked = sh.join(freq, "s")
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("__r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("__cnt"), col("s"))))
    val prefix = ranked
      .filter(col("__r") <= col("__n") - expr("(__n * 4 + 4) div 5") + 1)
      .select(col("doc_id"), col("s"), col("__r").cast("long").as("__r"), col("__n"))
      .cache()
    timed("prefix rows")(prefix.count())

    val a2 = prefix.select(col("doc_id").as("doc_a"), col("s"),
      col("__r").as("ra"), col("__n").as("na"))
    val b2 = prefix.select(col("doc_id").as("doc_b"), col("s"),
      col("__r").as("rb"), col("__n").as("nb"))
    val minOverlap = expr("(4 * (na + nb) + 8) div 9")
    val joined = a2.join(b2, "s").filter(col("doc_a") < col("doc_b"))
    timed("raw join rows")(joined.count())
    val filtered = joined
      .filter(lit(5L) * least(col("na"), col("nb")) >=
        lit(4L) * greatest(col("na"), col("nb")))
      .filter(lit(1L) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
        minOverlap)
    timed("post per-row filters")(filtered.count())
    val cand = filtered
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"), max(col("ra")).as("ram"),
        max(col("rb")).as("rbm"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .filter(col("c") + least(col("na") - col("ram"), col("nb") - col("rbm")) >=
        minOverlap)
      .select("doc_a", "doc_b", "na", "nb")
      .cache()
    timed("candidate pairs")(cand.count())

    val arrs = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("s"))).as("arr"))
    val out = cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("arr").as("arr_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("arr").as("arr_b")), "doc_b")
      .withColumn("i", size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b", "jaccard")
    timed("verify + output")(out.count())
    spark.stop()
  }
}
