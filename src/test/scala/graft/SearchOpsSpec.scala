package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.SearchOps

/** Inverted-index search (q98/q99): the posting-intersection answer always
  * equals a direct corpus scan, for any number of terms.
  */
class SearchOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def directScan(terms: Seq[String]): Seq[Long] = {
    val toks = tokens(col("text"))
    Tables.documents(spark, sf)
      .filter(terms.map(t => array_contains(toks, t)).reduce(_ && _))
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
  }

  private def viaIndex(terms: Seq[String]): Seq[Long] =
    SearchOps.conjunctiveSearch(spark, sf, terms)
      .collect().map(_.getLong(0)).toSeq

  test("1-, 2- and 3-term conjunctions match the direct scan") {
    for (terms <- Seq(Seq("dup"), Seq("dup", "window"), Seq("spark", "join", "slow"))) {
      viaIndex(terms) shouldBe directScan(terms)
      withClue(s"sanity: $terms should hit something at sf0.001: ") {
        viaIndex(terms) should not be empty
      }
    }
  }

  test("a term absent from the corpus empties the conjunction") {
    viaIndex(Seq("window", "zzz_not_a_token")) shouldBe empty
  }

  test("duplicate terms collapse: [dup, dup] answers like [dup]") {
    viaIndex(Seq("dup", "dup")) shouldBe directScan(Seq("dup"))
  }

  test("bm25 ranks only docs containing a query term, scores positive-desc") {
    val terms = Seq("dup", "window")
    val rows = SearchOps.bm25(spark, sf, terms, 20).collect()
    rows should not be empty
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    scores shouldBe scores.sortBy(-_) // already in rank order
    all(scores) should be > 0.0
    // every ranked doc matches at least one term (union of postings)
    val union = terms.flatMap(t => directScanAny(Seq(t))).toSet
    rows.map(_.getAs[Long]("doc_id")).foreach(id => union should contain(id))
  }

  private def directScanAny(terms: Seq[String]): Seq[Long] = {
    val toks = tokens(col("text"))
    Tables.documents(spark, sf)
      .filter(terms.map(t => array_contains(toks, t)).reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
  }

  test("q98 postings are sorted, distinct, and consistent with doc_freq") {
    val rows = SearchOps.q98.build(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
      ids shouldBe ids.distinct.sorted
      ids.size.toLong shouldBe r.getAs[Long]("doc_freq")
    }
  }
}
