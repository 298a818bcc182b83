package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Inverted-index operators: build token→postings lists and answer
  * conjunctive (AND) term queries by posting intersection — the index
  * side of a corpus search/decontamination workflow.
  *
  * Scale posture: the index build is ONE shuffle of distinct
  * (token, doc_id) pairs; postings aggregate per token with map-side
  * partials. At 100 TB the index lands in the table store clustered by
  * token (`TableStore.createClustered`), so a query-time lookup
  * data-skips to the probed tokens' files instead of re-scanning the
  * corpus — here the gate builds it inline and proves the LOOKUP result
  * equals a direct corpus scan (the oracle never touches the index).
  */
object SearchOps {

  /** q98: the inverted index itself — document frequency + the sorted
    * posting list per token, for every token appearing in ≥20 documents.
    * Postings serialize as a comma-joined string (long→decimal renders
    * identically in Spark and DuckDB, so the gate hash-compares the
    * lists bit-for-bit). */
  val q98 = QueryDef(
    "q98_inverted_index",
    """WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS w
      |  FROM documents)
      |SELECT w, COUNT(*) AS doc_freq,
      |  array_to_string(list_sort(list(doc_id)), ',') AS postings
      |FROM tok GROUP BY 1 HAVING COUNT(*) >= 20 ORDER BY w""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .distinct()
      .groupBy("w")
      .agg(count(lit(1)).as("doc_freq"),
        concat_ws(",", sort_array(collect_set(col("doc_id")))).as("postings"))
      .filter(col("doc_freq") >= 20)
      .orderBy("w")
  }

  /** The AND-query: documents containing every term, answered from the
    * (token, doc_id) posting pairs — touch only the probed terms'
    * postings, intersect by counting distinct matched terms per doc. */
  def conjunctiveSearch(s: org.apache.spark.sql.SparkSession, dir: String,
                        terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "conjunctive search needs at least one term")
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("w")).as("n_hit"))
      .filter(col("n_hit") === terms.length)
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** q99: conjunctive search via the index vs. a direct corpus scan (the
    * oracle) — same result, but the index path reads two posting lists
    * where the scan reads every document. */
  val q99 = QueryDef(
    "q99_conjunctive_search",
    """SELECT doc_id FROM documents
      |WHERE list_contains(string_split(trim(text), ' '), 'dup')
      |  AND list_contains(string_split(trim(text), ' '), 'window')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    conjunctiveSearch(s, d, Seq("dup", "window"))
  }

  val all: Seq[QueryDef] = Seq(q98, q99)
}
