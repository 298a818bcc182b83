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

  /** Posting-list length ceiling: a stop-word token's posting list is
    * corpus-sized, and `collect_set` grows its aggregation buffer with
    * every element DURING the aggregate — a post-hoc filter can't undo
    * that memory. The index therefore counts document frequency FIRST
    * (a cheap count aggregate), drops tokens outside [minDf, maxDf], and
    * only then collects postings — every surviving buffer is ≤ maxDf
    * elements by construction. Far above any test corpus's df; binding
    * exactly where it matters at 100 TB (stop words, boilerplate). */
  val MaxPostings = 100000L

  /** q98: the inverted index itself — document frequency + the sorted
    * posting list per token, for every token appearing in ≥20 documents
    * (and ≤ [[MaxPostings]] — see above). Postings serialize as a
    * comma-joined string (long→decimal renders identically in Spark and
    * DuckDB, so the gate hash-compares the lists bit-for-bit).
    *
    * One data shuffle: the df filter join and the postings aggregate both
    * key on `w`, so the join's hash partitioning is reused by the final
    * groupBy without a second exchange. */
  val q98 = QueryDef(
    "q98_inverted_index",
    s"""WITH tok AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS w
      |  FROM documents),
      |df AS (
      |  SELECT w FROM tok GROUP BY 1
      |  HAVING COUNT(*) >= 20 AND COUNT(*) <= $MaxPostings)
      |SELECT t.w, COUNT(*) AS doc_freq,
      |  array_to_string(list_sort(list(t.doc_id)), ',') AS postings
      |FROM tok t JOIN df ON df.w = t.w
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .distinct()
    val keep = pairs.groupBy("w").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 20 && col("__df") <= MaxPostings)
      .select("w")
    pairs.join(keep, "w")
      .groupBy("w")
      .agg(count(lit(1)).as("doc_freq"),
        concat_ws(",", sort_array(collect_set(col("doc_id")))).as("postings"))
      .orderBy("w")
  }

  /** The AND-query: documents containing every term, answered from the
    * (token, doc_id) posting pairs — touch only the probed terms'
    * postings, intersect by counting distinct matched terms per doc. */
  def conjunctiveSearch(s: org.apache.spark.sql.SparkSession, dir: String,
                        terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "conjunctive search needs at least one term")
    val ts = terms.distinct // a repeated term must not inflate the hit target
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").isin(ts: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("w")).as("n_hit"))
      .filter(col("n_hit") === ts.length)
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

  /** q101: BM25 ranked retrieval — the scoring side of the q98/q99 index.
    * Classic Okapi shape, k1 = 1.2, b = 0.75, with the log-free idf
    * variant idf(t) = (N - df + 0.5)/(df + 0.5): every factor is IEEE
    * +,-,×,÷ on doubles, so Spark and DuckDB produce bit-identical scores
    * when the expression trees associate identically (they are written as
    * literal mirrors below). `ln` is deliberately avoided — libm vs JDK
    * log can differ in the last ulp and would flake the hash gate.
    *
    * The per-doc score sums ONE double per query term; the gate query uses
    * two terms, and a+b is IEEE-commutative, so Spark's unordered partial
    * aggregation cannot change the bits. (3+ terms would make the sum
    * order-sensitive — a production caller gets ranked results either way,
    * but the cross-engine gate pins exactly this 2-term form.)
    *
    * Scale posture: df (one row per query term) and the corpus stats (one
    * row) broadcast; the only shuffle joins the per-term postings (docs
    * containing a query term) against doc lengths on doc_id. At 100 TB
    * the dl table is the stored index's doc-length sidecar, not a rescan. */
  def bm25(s: org.apache.spark.sql.SparkSession, dir: String,
           terms: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    val stats = dl.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    tf.crossJoin(broadcast(stats))
      .join(broadcast(dfreq), "w")
      .join(dl, "doc_id")
      .select(col("doc_id"),
        (((col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          ((col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))))
          .as("s"))
      .groupBy("doc_id").agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  val q101 = QueryDef(
    "q101_bm25_rank",
    """WITH dl AS (
      |  SELECT doc_id, len(string_split(trim(text), ' ')) AS dl FROM documents),
      |stats AS (
      |  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
      |         CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
      |tf AS (
      |  SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w FROM documents)
      |  WHERE w IN ('dup', 'window') GROUP BY 1, 2),
      |df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
      |SELECT tf.doc_id AS doc_id,
      |  SUM(((stats.n - df.df + 0.5) / (df.df + 0.5)) *
      |      ((tf.tf * 2.2) /
      |       (tf.tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl))))) AS score
      |FROM tf CROSS JOIN stats
      |JOIN df ON df.w = tf.w
      |JOIN dl ON dl.doc_id = tf.doc_id
      |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin) { (s, d) =>
    bm25(s, d, Seq("dup", "window"), 20)
  }

  val all: Seq[QueryDef] = Seq(q98, q99, q101)
}
