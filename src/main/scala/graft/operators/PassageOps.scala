package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.TextFunctions.tokens

/** Passage-granular exact deduplication (the Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better" idea of
  * removing repeated token spans, restated at fixed window granularity):
  * documents are cut into fixed-width token windows ("passages"), each
  * passage is deduplicated globally keep-first, and every document is
  * reassembled from its surviving passages in original order.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - dedup is ONE hash aggregation keyed on the passage digest with a
  *    `min(struct(doc_id, chunk, passage))` payload — map-side partial
  *    aggregation absorbs hot passages (boilerplate repeated millions of
  *    times collapses per-partition before the shuffle), unlike a
  *    `row_number` window whose hottest partition would be one task.
  *  - the shuffle key is the 32-char digest, not the passage text; the
  *    winning passage rides inside the aggregation buffer.
  *  - reassembly is a per-doc aggregation (collect_list bounded by
  *    passages-per-doc, i.e. document length — the same bound any
  *    per-document transform already carries).
  */
object PassageOps {

  /** Passage width in tokens. 8 gives this corpus a ~5% duplicate-passage
    * rate at sf0.01 — big enough to prove the machinery, small enough that
    * reassembled documents remain mostly intact. */
  private val W = 8

  /** §2.11 — passage-level exact dedup + document reassembly. Output one
    * row per document: passage count, surviving count, rebuilt text (NULL
    * when every passage of the doc lost keep-first). */
  val q113 = QueryDef(
    "q113_passage_dedup",
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       |b AS (SELECT doc_id, CAST(ceil(len(toks) / $W.0) AS BIGINT) AS n_psg, toks FROM t),
       |c AS (SELECT doc_id, n_psg, unnest(range(0, n_psg)) AS chunk, toks FROM b),
       |p AS (SELECT doc_id, chunk,
       |        array_to_string(toks[(chunk*$W+1):(chunk*$W+$W)], ' ') AS passage
       |      FROM c),
       |k AS (SELECT doc_id, chunk, passage,
       |        ROW_NUMBER() OVER (PARTITION BY md5(passage)
       |                           ORDER BY doc_id, chunk) AS rn
       |      FROM p),
       |r AS (SELECT doc_id, COUNT(*) AS n_kept,
       |        string_agg(passage, ' ' ORDER BY chunk) AS text
       |      FROM k WHERE rn = 1 GROUP BY doc_id)
       |SELECT b.doc_id, b.n_psg, COALESCE(r.n_kept, 0) AS n_kept, r.text
       |FROM b LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_psg", ceil(size(col("toks")) / lit(W.toDouble)).cast("long"))
    val psg = t
      .select(col("doc_id"), explode(sequence(lit(0L), col("n_psg") - 1)).as("chunk"), col("toks"))
      .select(col("doc_id"), col("chunk"),
        array_join(expr(s"slice(toks, cast(chunk * $W + 1 as int), $W)"), " ").as("passage"))
    // global keep-first: one digest-keyed aggregate; min(struct) orders by
    // (doc_id, chunk) — the payload passage never influences the winner
    // because (doc_id, chunk) is unique
    val kept = psg
      .groupBy(md5(col("passage")).as("h"))
      .agg(min(struct(col("doc_id"), col("chunk"), col("passage"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.chunk").as("chunk"),
        col("f.passage").as("passage"))
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("chunk"), col("passage")))),
        x => x.getField("passage")), " ").as("text"))
    t.select(col("doc_id"), col("n_psg"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_psg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("text"))
      .orderBy("doc_id")
  }

  /** Chunk width / stride (tokens) for the retrieval chunker. 64/48 gives
    * 16 tokens of overlap — the standard RAG recipe shape (windowed
    * passages with context carry-over at the seams). */
  private val C = 64
  private val S = 48

  /** q152: RAG document chunking — overlapping token windows, one row per
    * chunk with its token offset, width, and an exact content digest (the
    * retrieval index key). A doc of n tokens yields 1 chunk when n <= C,
    * else ((n - (C-S+1)) div S) + 1 chunks at starts 0, S, 2S, … — the
    * last window always reaches token n, and no window is fully contained
    * in its predecessor.
    *
    * Scale posture: pure per-document fan-out (explode over a computed
    * range) — no join, no shuffle except the gate's deterministic
    * ORDER BY; the digest is computed where the chunk is born, so a
    * downstream index build shuffles 32-char digests, never chunk text.
    * All arithmetic is exact integers (positive operands, so Spark `div`
    * ≡ DuckDB `//`). */
  val q152 = QueryDef(
    "q152_doc_chunking",
    s"""WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks,
       |             len(string_split(trim(text), ' ')) AS n FROM documents),
       |c AS (SELECT doc_id, toks, n,
       |        CASE WHEN n <= $C THEN 1
       |             ELSE (n - ${C - S + 1}) // $S + 1 END AS n_chunks
       |      FROM t),
       |e AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id
       |      FROM c)
       |SELECT doc_id, chunk_id,
       |  chunk_id * $S AS start_tok,
       |  least($C, n - chunk_id * $S) AS n_chunk_tokens,
       |  md5(array_to_string(
       |    toks[(chunk_id*$S+1):(chunk_id*$S+least($C, n - chunk_id*$S))],
       |    ' ')) AS chunk_digest
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n") <= C, lit(1L))
          .otherwise(expr(s"(n - ${C - S + 1}) div $S + 1")))
    t.select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * S)
      .withColumn("n_chunk_tokens", least(lit(C.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_chunk_tokens"),
        md5(array_join(
          expr(s"slice(toks, cast(start_tok + 1 as int), cast(n_chunk_tokens as int))"),
          " ")).as("chunk_digest"))
      .orderBy("doc_id", "chunk_id")
  }

  val all: Seq[QueryDef] = Seq(q113, q152)
}
