package graft

import org.apache.spark.sql.functions._

/** Passage-level dedup on a hand-built corpus with a known shared window. */
class PassageOpsSpec extends SparkSpec {

  // W = 8: passages are 8-token windows. Build three docs where doc 0 and
  // doc 1 share their FIRST 8 tokens exactly, and doc 2 is doc 0 verbatim
  // (every passage a duplicate → reassembles to NULL).
  private val shared = "a b c d e f g h"
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, s"$shared tail0 tail1 tail2"),
      (1L, s"$shared other words here"),
      (2L, s"$shared tail0 tail1 tail2")
    ).toDF("doc_id", "text")
  }

  private def run = {
    val dir = tempDir("psg").toString
    corpus.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", expr("length(text)"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    operators.PassageOps.q113.build(spark, dir).collect()
  }

  test("property: a corpus with globally-unique tokens round-trips unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // every token globally unique → no passage can repeat → dedup must be
    // the identity on text, for any doc length (incl. non-multiples of W)
    val docs = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, (0 until n).map(j => s"d${i}w$j").mkString(" "))
    }
    val dir = tempDir("psg-prop").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", expr("length(text)"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = operators.PassageOps.q113.build(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      val (nPsg, nKept, rebuilt) = out(id)
      withClue(s"doc $id: ") {
        nKept shouldBe nPsg
        rebuilt shouldBe text
      }
    }
  }

  test("keep-first drops the shared window from later docs and rebuilds order") {
    val rows = run.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 0: 11 tokens → 2 passages (8 + 3), both kept, text intact
    rows(0L) shouldBe ((2L, 2L, "a b c d e f g h tail0 tail1 tail2"))
    // doc 1: loses the shared first window, keeps its 3-token tail
    rows(1L) shouldBe ((2L, 1L, "other words here"))
    // doc 2: identical to doc 0 → every passage already seen → NULL text
    rows(2L)._1 shouldBe 2L
    rows(2L)._2 shouldBe 0L
    rows(2L)._3 shouldBe null
  }

  test("q152 chunking invariants: stride spacing, full coverage, no contained chunk") {
    val rows = operators.PassageOps.q152.build(spark, "/root/testdata/sf0.001")
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTok = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), expr("cast(size(split(trim(text), ' ')) as long)").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..k-1 and starts are exactly stride-spaced
      sorted.map(_._2) shouldBe (0L until sorted.length.toLong)
      sorted.foreach { case (_, cid, start, len) =>
        start shouldBe cid * 48
        len shouldBe math.min(64L, n - start)
        len should be > 0L
      }
      // the last chunk reaches the final token: full coverage
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n)
      // no chunk is fully contained in its predecessor (each adds tokens)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, l2)) => s2 + l2 should be > (s1 + l1)
        case _ =>
      }
    }
  }
}
