package graft

import org.apache.spark.sql.functions._

/** Property tests for the RAG chunker (q152) and weighted quantiles
  * (q162) on randomized inputs: the chunker's coverage/overlap algebra
  * and the weighted-quantile cross-multiplication are exactly the places
  * where an off-by-one silently corrupts downstream retrieval/stats.
  */
class ChunkingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = tempDir("chunkprop").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", expr("length(text)"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("property: chunking covers every token exactly, for 1..200-token docs") {
    val rnd = new scala.util.Random(7)
    // token counts straddling every boundary: 1, 63, 64, 65, stride
    // multiples, and random lengths
    val lengths = Seq(1, 2, 63, 64, 65, 96, 112, 113, 160, 161) ++
      Seq.fill(10)(1 + rnd.nextInt(200))
    val docs = lengths.zipWithIndex.map { case (n, i) =>
      i.toLong -> Vector.tabulate(n)(j => s"t$j").mkString(" ")
    }
    val dir = writeDocs(docs)
    val rows = operators.PassageOps.q152.build(spark, dir)
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length.toLong
      val cs = byDoc(id).sortBy(_._2)
      // expected chunk count from the documented formula
      val expect = if (n <= 64) 1L else (n - 17) / 48 + 1
      cs.length.toLong shouldBe expect
      // full coverage: union of [start, start+len) == [0, n), in order
      assert(cs.head._3 == 0L)
      assert(cs.last._3 + cs.last._4 == n)
      cs.foreach { case (_, cid, start, len) =>
        assert(start == cid * 48 && len == math.min(64L, n - start) && len > 0)
      }
      // consecutive chunks overlap by exactly 16 tokens (except short tails)
      cs.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          val overlap = s1 + l1 - s2
          assert(overlap == 16L || s1 + l1 == n,
            s"doc $id: unexpected overlap $overlap")
        case _ =>
      }
    }
  }

  test("property: weighted quantiles match a brute-force scan on random data") {
    // q162 semantics on a tiny controlled lineitem: dollar-grid weighted
    // quantile q/4 = smallest dollar with 4*cumWeight >= q*total
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map { i =>
      val flag = Seq("A", "N", "R")(rnd.nextInt(3))
      val price = 1.0 + rnd.nextInt(50) + 0.25 * rnd.nextInt(4)
      val qty = 1.0 + rnd.nextInt(9)
      (i.toLong, flag, price, qty)
    }
    val dir = tempDir("wqprop").toString
    rows.toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_quantity")
      .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
      .withColumn("l_linenumber", lit(1)).withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0)).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate", lit("2024-01-01").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = operators.Extras.q162.build(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.groupBy(_._2).foreach { case (flag, rs) =>
      // brute force on the same dollar/centi-unit grid
      val grid = rs.groupBy(r => (r._3 * 100).round / 100)
        .map { case (dollar, v) => dollar -> v.map(r => (r._4 * 100).round).sum }
        .toSeq.sortBy(_._1)
      val total = grid.map(_._2).sum
      def pick(num: Long, den: Long): Long = {
        var cum = 0L
        grid.find { case (_, w) => cum += w; den * cum >= num * total }.get._1
      }
      got(flag) shouldBe ((pick(1, 4), pick(1, 2), pick(3, 4)))
    }
  }
}
