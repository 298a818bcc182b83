package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions._

/** Near-duplicate cluster resolution: connected components over the
  * verified near-dup pair graph, assigning every document to a component
  * whose id is the minimum doc_id it can reach — i.e. the keeper. This is
  * the step that turns pair detection (q47/q48) into actual corpus
  * deduplication (drop every doc whose component ≠ itself).
  *
  * Spark side: iterative min-label propagation over the edge list —
  * each round is one join + aggregate (all distributed); rounds needed =
  * graph diameter (near-dup clusters are tiny chains, so convergence is
  * fast; the loop exits as soon as a round changes nothing). The oracle
  * computes the same fixpoint with a recursive CTE. The component-id
  * objective (min reachable doc_id) is algorithm-independent, so both
  * engines agree exactly.
  */
object DedupClusters {

  /** Verified Jaccard ≥ 0.8 pairs (q47 semantics) — the cluster edges. */
  private def pairSql =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2
       |    HAVING CAST(COUNT(*) AS DOUBLE) / CAST(
       |      (SELECT COUNT(*) FROM sh WHERE doc_id = a.doc_id)
       |      + (SELECT COUNT(*) FROM sh WHERE doc_id = b.doc_id) - COUNT(*) AS DOUBLE) >= 0.8""".stripMargin

  val q71 = QueryDef(
    "q71_neardup_components",
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, unnest(${shinglesNSql("t", 3)}) AS s
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents)),
       |pairs AS (
       |  $pairSql),
       |edges AS (SELECT doc_a AS s, doc_b AS t FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |closure(a, b) AS (
       |  SELECT s, t FROM edges
       |  UNION
       |  SELECT c.a, e.t FROM closure c JOIN edges e ON e.s = c.b),
       |comp AS (
       |  SELECT a AS doc_id, least(min(b), a) AS component
       |  FROM closure GROUP BY a)
       |SELECT c.doc_id, c.component,
       |  CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_members,
       |  c.doc_id = c.component AS is_keeper
       |FROM comp c ORDER BY component, doc_id""".stripMargin) { (s, d) =>
    // edges from the exact-Jaccard pair detector (q47 semantics)
    val sh = Tables.documents(s, d)
      .withColumn("t", tokens(col("text")))
      .withColumn("s", explode(shingles3("t")))
      .select("doc_id", "s").distinct().cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.toDF("doc_a", "s")
      .join(sh.toDF("doc_b", "s"), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      .join(broadcast(sizes.toDF("doc_a", "na")), Seq("doc_a"))
      .join(broadcast(sizes.toDF("doc_b", "nb")), Seq("doc_b"))
      .filter(col("i").cast("double")
        / (col("na") + col("nb") - col("i")).cast("double") >= 0.8)
      .select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()

    // min-label propagation to fixpoint
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val viaNeighbor = edges
        .join(labels.toDF("dst", "nbr_component"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_component")).as("best_nbr"))
      val next = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("best_nbr"), col("component"))).as("component"))
        .cache()
      changed = next.toDF("doc_id", "next_component")
        .join(labels, Seq("doc_id"))
        .filter(col("next_component") =!= col("component")).count()
      labels = next
      rounds += 1
    }

    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    labels
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === col("component"))
      .select("doc_id", "component", "n_members", "is_keeper")
      .orderBy("component", "doc_id")
  }

  val all: Seq[QueryDef] = Seq(q71)
}
