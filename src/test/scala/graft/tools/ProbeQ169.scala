package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Stage-by-stage timing probe for q169 (BPE encode) on a replica dir —
  * attributes its 10× growth (3.25× in scale_r14_10x.json, one of the
  * two worst non-dedup rows) to the distinct-word table build, the 3
  * driver-iterated training rounds (per-round pair aggregate + 1-row
  * top-1 + broadcast replace — mostly fixed scheduling toll), and the
  * per-occurrence encode join + per-doc rollup (the true data term).
  * Diagnostic main, like [[ProbeQ157]]. */
object ProbeQ169 {
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
      println(f"[probe-q169] $name -> ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }

    time("scan_only")(docs.agg(sum(length(col("text")))).head().getLong(0))
    var cur = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        concat(lit(" "),
          array_join(expr("filter(split(w, ''), x -> x <> '')"), " "),
          lit(" ")).as("s"))
    time("distinct_words")(cur.count())
    val tTrain = System.nanoTime()
    (1 to 3).foreach { _ =>
      val pairs = cur
        .select(col("cnt"), split(trim(col("s")), " ").as("arr"))
        .select(col("cnt"), col("arr"),
          explode(expr(
            "if(size(arr) >= 2, sequence(1, size(arr) - 1), cast(array() as array<int>))")).as("i"))
        .select(col("cnt"), expr("element_at(arr, i)").as("l"),
          expr("element_at(arr, i + 1)").as("r"))
        .groupBy("l", "r").agg(sum(col("cnt")).as("freq"))
      val top1 = pairs.orderBy(col("freq").desc, col("l"), col("r")).limit(1)
      cur = cur.crossJoin(broadcast(top1))
        .select(col("w"), col("cnt"),
          expr("replace(s, concat(' ', l, ' ', r, ' '), concat(' ', l, r, ' '))").as("s"))
    }
    time("train_3_rounds")(cur.count()) // forces the 3 chained rounds
    val enc = cur.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("np"),
      length(col("w")).cast("long").as("nc"))
    val dw = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    time("doc_word_rows")(dw.count())
    time("encode_join_rollup") {
      dw.join(enc, Seq("w"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_words"),
          sum(col("np")).as("n_pieces"), sum(col("nc")).as("n_chars"))
        .count()
    }
    time("full_q169")(operators.TextAnalysis.q169.build(spark, dir).count())
    spark.stop()
  }
}
