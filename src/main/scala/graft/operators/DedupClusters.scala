package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Near-duplicate cluster resolution: connected components over the
  * verified near-dup pair graph, assigning every document to a component
  * whose id is the minimum doc_id it can reach — i.e. the keeper. This is
  * the step that turns pair detection (q48) into actual corpus
  * deduplication (drop every doc whose component ≠ itself).
  *
  * Edges come from the banded MinHash-LSH candidate pipeline
  * ([[Dedup.lshVerifiedPairs]] / [[Dedup.lshPairsCtes]]) — the 100 TB
  * shape: candidate generation is a bucket equi-join, never an all-pairs
  * shingle self-join. Both engines consume the SAME pair definition, so
  * the component fixpoint agrees exactly regardless of LSH recall.
  *
  * Spark side: iterative min-label propagation over the edge list — each
  * round is one join + aggregate (all distributed), `localCheckpoint`ed so
  * lineage stays O(1) across rounds instead of growing by one join per
  * round. Rounds needed = graph diameter (near-dup clusters are tiny
  * chains). Non-convergence within the round budget is an ERROR, not a
  * silently-shipped wrong answer. The oracle computes the same fixpoint
  * with a recursive CTE; the component-id objective (min reachable doc_id)
  * is algorithm-independent, so both engines agree exactly.
  */
object DedupClusters {

  private val MaxRounds = 50

  val q71 = QueryDef(
    "q71_neardup_components",
    s"""WITH RECURSIVE ${Dedup.lshPairsCtes},
       |pairs AS (SELECT doc_a, doc_b FROM verified),
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
    // edges from the scalable LSH pair detector (q48), both directions
    val pairs = Dedup.lshVerifiedPairs(s, d).select("doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()

    // min-label propagation to fixpoint; every round materializes via
    // localCheckpoint so the next round's plan starts from stored blocks
    // (constant-depth lineage, no recursive re-execution)
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .localCheckpoint(true)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < MaxRounds) {
      val viaNeighbor = edges
        .join(labels.toDF("dst", "nbr_component"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nbr_component")).as("best_nbr"))
      val stepped = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"), col("component"),
          least(col("component"), coalesce(col("best_nbr"), col("component"))).as("next_component"))
        .localCheckpoint(true)
      changed = stepped.filter(col("next_component") =!= col("component")).count()
      labels = stepped.select(col("doc_id"), col("next_component").as("component"))
      rounds += 1
    }
    // the loop ran eagerly (per-round count actions) and the final labels
    // are localCheckpoint-materialized, so the edge cache is dead weight
    // from here on — release it on the failure path too, not just success
    edges.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected-components label propagation did not converge after $MaxRounds rounds " +
          s"($changed labels still changing) — graph diameter exceeds the round budget")

    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    labels
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === col("component"))
      .select("doc_id", "component", "n_members", "is_keeper")
      .orderBy("component", "doc_id")
  }

  val all: Seq[QueryDef] = Seq(q71)
}
