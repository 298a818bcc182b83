package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial corpora for the streaming admission gate (q191): the sf
  * oracle exercises one uniform shape; these engineer the cases the
  * carried-state arithmetic hinges on — a document landing EXACTLY on
  * the budget (admitted: the rule is <=), the next one overflowing by a
  * single token (cut), sources whose whole corpus fits under budget,
  * single-document sources, and doc_id gaps that make the quarter-range
  * replay slices carry wildly uneven row counts (including empty
  * slices). Each seeded corpus pins the sliced streamed result
  * row-identical to the batch cumulative-sum truth computed inline. */
class AdmissionGatePropertySpec extends SparkSpec {

  private def corpus(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var id = 0L
    def add(source: String, ntok: Int, idGap: Long = 1L): Unit = {
      id += idGap
      val text = Seq.fill(ntok)("w").mkString(" ")
      rows += ((id, text, "en", source, text.length.toLong)); ()
    }
    // random bulk: uneven doc lengths, clustered doc_ids (slice skew)
    (1 to 200).foreach { _ =>
      add(s"s${rnd.nextInt(6)}", 1 + rnd.nextInt(30),
        if (rnd.nextInt(10) == 0) 50L + rnd.nextInt(500) else 1L)
    }
    // engineered: exact budget landing (60 = 25 + 35), then a 1-token
    // overflow doc, then one more that would fit alone (stays cut: the
    // running total never resets)
    add("edge", 25); add("edge", 35); add("edge", 1); add("edge", 1)
    // a source entirely under budget (everything admitted)
    add("tiny", 5); add("tiny", 7)
    // a single-document source over budget on its first doc
    add("fat", 100)
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def truth(docs: DataFrame, budget: Long): Seq[String] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(split(trim(col("text")), " "))
          .cast("long").as("ntok"))
      .withColumn("cum_tokens", sum(col("ntok")).over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy("doc_id").collect().map(_.toString).toSeq
  }

  for (seed <- Seq(7, 41)) {
    test(s"seed $seed: sliced admission equals the batch cumulative-sum truth") {
      val dir = tempDir(s"graft-admitprop$seed")
      val docs = corpus(seed)
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val budget = 60L
      // tiny rowsPerFile forces the multi-slice, multi-file replay shape
      val streamed = operators.CorpusOps
        .q191Impl(rowsPerFile = 20L, budget = budget)(spark, dir.toString)
        .collect().map(_.toString).toSeq
      streamed shouldBe truth(docs, budget)
      // the engineered edge rows actually bite: the exact-landing doc is
      // admitted, the overflow docs are not
      val bySrc = operators.CorpusOps
        .q191Impl(rowsPerFile = 20L, budget = budget)(spark, dir.toString)
        .filter(col("source") === "edge").collect()
      bySrc.length shouldBe 2
      bySrc.map(_.getLong(3)).max shouldBe budget
    }
  }
}
