package graft

import graft.operators.Similarity

/** Recall invariants of the multi-probe IVF gate query (q89). The corpus
  * is structureless (within/cross-label cosine both ≈ 0), so no fixed
  * recall threshold is meaningful — what must hold for ANY corpus:
  * recall@5 is monotone non-decreasing in nprobe, and probing every
  * cluster (nprobe = K) reproduces the exact baseline, recall ≡ 1.0. */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q89: recall monotone in nprobe; nprobe=K reproduces the exact top-5") {
    val rows = Similarity.q89.build(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    rows.length shouldBe 30 // 10 queries × 3 probe levels

    val byQuery = rows.groupBy(_._1)
    byQuery.foreach { case (q, rs) =>
      val byNp = rs.sortBy(_._2)
      withClue(s"query $q: ") {
        // monotone: more probed clusters can only add candidates
        byNp.map(_._4).toSeq.sliding(2).foreach {
          case Seq(a, b) => a should be <= b
          case _ => ()
        }
        // probing all 10 clusters IS the exact scan
        byNp.last._2 shouldBe 10
        byNp.last._4 shouldBe 1.0
        byNp.last._3 shouldBe 5L
      }
    }
    // recall5 is always hits/5
    rows.foreach { case (_, _, h, r) => r shouldBe h.toDouble / 5 }
  }

  test("q114: drops exact duplicates within a cluster only, keeps the min id") {
    // 64-dim toy corpus: vecs 0,1,2 identical in label 0 (keep only 0);
    // vec 3 identical to them but in label 1 (cross-cluster: kept);
    // vec 4 orthogonal in label 0 (kept).
    val a = Array.fill(64)(0.1f)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) 0.1f else -0.1f)
    val rows = Seq((0L, a, 0), (1L, a, 0), (2L, a, 0), (3L, a, 1), (4L, b, 0))
    val dir = tempDir("semdedup").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val kept = Similarity.q114.build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    kept shouldBe Map(0L -> true, 1L -> false, 2L -> false, 3L -> true, 4L -> true)
  }
}
