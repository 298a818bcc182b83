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
    val labels = components(s, d)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    labels
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("is_keeper", col("doc_id") === col("component"))
      .select("doc_id", "component", "n_members", "is_keeper")
      .orderBy("component", "doc_id")
  }

  /** Connected components over the LSH-verified near-dup graph:
    * (doc_id, component = min reachable doc_id), for docs that appear in
    * at least one pair. Shared by q71 and the dedup-aware split (q131). */
  private[operators] def components(s: org.apache.spark.sql.SparkSession,
                                    d: String): org.apache.spark.sql.DataFrame = {
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
    labels
  }

  /** Dedup-AWARE train/val/test split (the leakage problem Lee et al.
    * 2022 measure: near-duplicates straddling the train/test boundary
    * inflate eval): a naive per-doc hash split scatters the members of a
    * near-dup cluster across splits, so the same (near-)text trains AND
    * evaluates; hashing the COMPONENT id instead sends whole clusters to
    * one split. Emits both schemes' split sizes plus the hard number —
    * verified near-dup pairs whose endpoints landed in different splits:
    * nonzero for naive, ZERO by construction for aware.
    *
    * Scale posture: components are the q71 fixpoint (already bounded);
    * split assignment is one hash expression; leakage counting joins the
    * pair list against the (doc_id, split) assignment twice. The pair
    * list is candidate-bounded and broadcasts; the split assignment is
    * one row PER DOCUMENT — corpus-cardinality, so it must never carry a
    * broadcast hint (the same contract as Dedup's `sizes` frame). */
  val q131 = QueryDef(
    "q131_dedup_aware_split",
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
       |  FROM closure GROUP BY a),
       |lbl AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN h_doc < 8 THEN 'train' WHEN h_doc = 8 THEN 'val' ELSE 'test' END AS naive_split,
       |    CASE WHEN h_cmp < 8 THEN 'train' WHEN h_cmp = 8 THEN 'val' ELSE 'test' END AS aware_split
       |  FROM (SELECT doc_id,
       |          ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 AS h_doc,
       |          ('0x' || substr(md5('split:' || CAST(component AS VARCHAR)), 1, 15))::BIGINT % 10 AS h_cmp
       |        FROM lbl)),
       |leak AS (
       |  SELECT
       |    CAST(COALESCE(SUM(CASE WHEN a.naive_split <> b.naive_split THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leak,
       |    CAST(COALESCE(SUM(CASE WHEN a.aware_split <> b.aware_split THEN 1 ELSE 0 END), 0) AS BIGINT) AS aware_leak
       |  FROM pairs p JOIN sp a ON a.doc_id = p.doc_a JOIN sp b ON b.doc_id = p.doc_b)
       |SELECT 'aware' AS scheme,
       |  CAST(SUM(CASE WHEN aware_split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |  CAST(SUM(CASE WHEN aware_split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       |  CAST(SUM(CASE WHEN aware_split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       |  (SELECT aware_leak FROM leak) AS leaked_pairs
       |FROM sp
       |UNION ALL
       |SELECT 'naive',
       |  CAST(SUM(CASE WHEN naive_split = 'train' THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(SUM(CASE WHEN naive_split = 'val' THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(SUM(CASE WHEN naive_split = 'test' THEN 1 ELSE 0 END) AS BIGINT),
       |  (SELECT naive_leak FROM leak)
       |FROM sp ORDER BY scheme""".stripMargin) { (s, d) =>
    import graft.functions.TextFunctions.hash60
    def splitOf(c: org.apache.spark.sql.Column) = {
      val h = hash60(concat(lit("split:"), c.cast("string"))) % 10
      when(h < 8, "train").when(h === 8, "val").otherwise("test")
    }
    val lbl = Tables.documents(s, d).select("doc_id")
      .join(components(s, d), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
      .select(col("doc_id"), splitOf(col("doc_id")).as("naive_split"),
        splitOf(col("component")).as("aware_split"))
      .cache()
    val pairs = Dedup.lshVerifiedPairs(s, d).select("doc_a", "doc_b")
    // broadcast the candidate-bounded PAIR side; `lbl` is one row per
    // corpus document and must join by shuffle (a broadcast hint on it
    // would ship the whole corpus's split assignment to every executor)
    val leak = broadcast(pairs)
      .join(lbl.select(col("doc_id").as("doc_a"),
        col("naive_split").as("na"), col("aware_split").as("aa")), Seq("doc_a"))
      .join(lbl.select(col("doc_id").as("doc_b"),
        col("naive_split").as("nb"), col("aware_split").as("ab")), Seq("doc_b"))
      .agg(
        coalesce(sum(when(col("na") =!= col("nb"), 1L).otherwise(0L)), lit(0L)).as("naive_leak"),
        coalesce(sum(when(col("aa") =!= col("ab"), 1L).otherwise(0L)), lit(0L)).as("aware_leak"))
    def scheme(name: String, splitCol: String, leakCol: String) =
      lbl.agg(
        sum(when(col(splitCol) === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col(splitCol) === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col(splitCol) === "test", 1L).otherwise(0L)).as("n_test"))
        .crossJoin(broadcast(leak.select(col(leakCol).as("leaked_pairs"))))
        .select(lit(name).as("scheme"), col("n_train"), col("n_val"),
          col("n_test"), col("leaked_pairs"))
    scheme("aware", "aware_split", "aware_leak")
      .unionByName(scheme("naive", "naive_split", "naive_leak"))
      .orderBy("scheme")
  }

  /** q156: canonical selection — within each near-dup component, keep the
    * HIGHEST-QUALITY member (q44's 3-gate score; ties to the lower
    * doc_id), not blindly the minimum id. This is the curation-correct
    * form of cluster collapse: q71 answers "which docs are the same?",
    * this answers "which copy do we train on?".
    *
    * Scale posture: quality is a per-doc projection joined to the
    * component labels on doc_id (two per-doc frames, shuffle equi-join,
    * nothing broadcast); the winner per component is ONE
    * max(struct(quality, -doc_id)) hash aggregate — map-side combinable,
    * never a window over the corpus — joined back on the component key. */
  /** q44's 3-gate quality score, shared by q156 (canonical selection) and
    * q181 (dedup savings) — SQL and Column forms kept in lockstep. */
  private val qualSql =
    """(CASE WHEN length(text) BETWEEN 100 AND 500 THEN 1 ELSE 0 END
      | + CASE WHEN len(string_split(trim(text), ' ')) >= 15 THEN 1 ELSE 0 END
      | + CASE WHEN len(regexp_extract_all(text, '[^a-z0-9 ]')) * 10
      |        <= len(string_split(trim(text), ' ')) THEN 1 ELSE 0 END)""".stripMargin

  private def qualityCol: org.apache.spark.sql.Column =
    when(length(col("text")).between(100, 500), 1).otherwise(0) +
      when(size(split(trim(col("text")), " ")) >= 15, 1).otherwise(0) +
      when(graft.functions.TextFunctions.punctCount(col("text")) * 10
          <= size(split(trim(col("text")), " ")), 1).otherwise(0)

  val q156 = {
    QueryDef(
      "q156_canonical_selection",
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
         |  FROM closure GROUP BY a),
         |q AS (SELECT doc_id, $qualSql AS quality FROM documents),
         |j AS (SELECT c.doc_id, c.component, q.quality
         |      FROM comp c JOIN q USING (doc_id)),
         |best AS (SELECT component, max(struct_pack(q := quality, nd := -doc_id)) AS b
         |         FROM j GROUP BY component)
         |SELECT j.doc_id, j.component, CAST(j.quality AS INT) AS quality_score,
         |  -(b.b).nd AS canonical_id,
         |  j.doc_id = -(b.b).nd AS is_canonical
         |FROM j JOIN best b USING (component)
         |ORDER BY component, doc_id""".stripMargin) { (s, d) =>
      val labels = components(s, d)
      val qual = Tables.documents(s, d).select(col("doc_id"), qualityCol.as("quality"))
      val j = labels.join(qual, Seq("doc_id"))
      val best = j.groupBy("component")
        .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("nd"))).as("b"))
        .select(col("component"), (-col("b").getField("nd")).as("canonical_id"))
      j.join(best, Seq("component"))
        .select(col("doc_id"), col("component"),
          col("quality").cast("int").as("quality_score"),
          col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("is_canonical"))
        .orderBy("component", "doc_id")
    }
  }

  /** q181: dedup token-savings report — THE headline number of every
    * dedup paper ("X% of training tokens were duplicates"): total corpus
    * tokens, tokens surviving exact dedup (keep-min-doc_id per content
    * hash), tokens surviving near-dup canonical collapse (q156's
    * quality-argmax keepers), and both savings in exact integer ppm.
    * One row, computed entirely from gate-proven building blocks.
    *
    * Scale posture: token counts are per-doc expression work; exact-dup
    * keepers are one digest-keyed aggregate (q46's shape); near-dup
    * removals join the component labels (candidate-bounded) against the
    * per-doc token frame on doc_id. Output is single-row scalars. */
  val q181 = QueryDef(
    "q181_dedup_savings",
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
       |  FROM closure GROUP BY a),
       |q AS (SELECT doc_id, $qualSql AS quality FROM documents),
       |j AS (SELECT c.doc_id, c.component, q.quality
       |      FROM comp c JOIN q USING (doc_id)),
       |best AS (SELECT component, max(struct_pack(q := quality, nd := -doc_id)) AS b
       |         FROM j GROUP BY component),
       |noncanon AS (SELECT j.doc_id FROM j JOIN best b USING (component)
       |             WHERE j.doc_id <> -(b.b).nd),
       |tok AS (SELECT doc_id, len(string_split(trim(text), ' ')) AS nt,
       |          md5(trim(text)) AS dg FROM documents),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |          CAST(SUM(nt) AS BIGINT) AS total FROM tok),
       |ex AS (SELECT CAST(SUM(t2.nt) AS BIGINT) AS kept
       |       FROM (SELECT MIN(doc_id) AS k FROM tok GROUP BY dg) kk
       |       JOIN tok t2 ON t2.doc_id = kk.k),
       |nd AS (SELECT CAST(COALESCE(SUM(t3.nt), 0) AS BIGINT) AS removed
       |       FROM noncanon nc JOIN tok t3 ON t3.doc_id = nc.doc_id)
       |SELECT tot.n_docs, tot.total AS total_tokens,
       |  ex.kept AS tokens_after_exact,
       |  tot.total - nd.removed AS tokens_after_neardup,
       |  CAST(((tot.total - ex.kept) * 1000000) // greatest(tot.total, 1)
       |    AS BIGINT) AS exact_savings_ppm,
       |  CAST((nd.removed * 1000000) // greatest(tot.total, 1) AS BIGINT)
       |    AS neardup_savings_ppm
       |FROM tot CROSS JOIN ex CROSS JOIN nd""".stripMargin) { (s, d) =>
    val tok = Tables.documents(s, d).select(col("doc_id"),
      size(split(trim(col("text")), " ")).cast("long").as("nt"),
      md5(trim(col("text"))).as("dg"))
    val tot = tok.agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total"))
    val keepers = tok.groupBy("dg").agg(min(col("doc_id")).as("doc_id"))
      .join(tok.select("doc_id", "nt"), Seq("doc_id"))
      .agg(sum(col("nt")).as("kept"))
    val labels = components(s, d)
    val qual = Tables.documents(s, d).select(col("doc_id"), qualityCol.as("quality"))
    val j = labels.join(qual, Seq("doc_id"))
    val best = j.groupBy("component")
      .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("nd"))).as("b"))
      .select(col("component"), (-col("b").getField("nd")).as("canonical_id"))
    val removed = j.join(best, Seq("component"))
      .filter(col("doc_id") =!= col("canonical_id"))
      .join(tok.select("doc_id", "nt"), Seq("doc_id"))
      .agg(coalesce(sum(col("nt")), lit(0L)).as("removed"))
    tot.crossJoin(broadcast(keepers)).crossJoin(broadcast(removed))
      .select(col("n_docs"), col("total").as("total_tokens"),
        col("kept").as("tokens_after_exact"),
        (col("total") - col("removed")).as("tokens_after_neardup"),
        expr("((total_tokens - tokens_after_exact) * 1000000) div greatest(total_tokens, 1)")
          .as("exact_savings_ppm"),
        expr("(removed * 1000000) div greatest(total_tokens, 1)")
          .as("neardup_savings_ppm"))
      .select("n_docs", "total_tokens", "tokens_after_exact", "tokens_after_neardup",
        "exact_savings_ppm", "neardup_savings_ppm")
  }

  val all: Seq[QueryDef] = Seq(q71, q131, q156, q181)
}
