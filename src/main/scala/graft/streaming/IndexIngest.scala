package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.operators.{SearchOps, Similarity}
import graft.sources.TableStore

/** Continuous INDEX maintenance — the q206/q208 epochs as streaming
  * sinks. Both maintenance paths are read-free ledgered appends (cost
  * strictly batch-proportional, replay no-ops on the epoch ledger) with
  * the shared auto-compaction policy collapsing long chains
  * layout-preservingly, so the serving reads' file prunes survive an
  * unbounded ingest. The monolithic-equivalence guarantees are the
  * gated ones: q101/q99 for the text index, q51 for the IVF lists. */
object IndexIngest {

  /** Wire as `docs.writeStream.foreachBatch(indexIngestSink(store))` —
    * each micro-batch of (doc_id, text) extends the term-clustered
    * BM25/conjunctive index (create via `SearchOps.buildSearchIndex`,
    * possibly empty). Serve any time with `SearchOps.bm25FromIndex`. */
  def indexIngestSink(store: TableStore): (DataFrame, Long) => Unit =
    (batch, epochId) => SearchOps.indexIngestEpoch(store)(batch, epochId)

  /** Wire as `vecs.writeStream.foreachBatch(ivfIngestSink(store))` —
    * each micro-batch of (vec_id, label, embedding) extends the
    * label-clustered IVF lists (create via `Similarity.buildIvfStore`,
    * possibly empty). Serve any time with `Similarity.ivfProbe`. */
  def ivfIngestSink(store: TableStore): (DataFrame, Long) => Unit =
    (batch, epochId) => Similarity.ivfIngestEpoch(store)(batch, epochId)

  /** Wire as `docs.writeStream.foreachBatch(chunkIndexIngestSink(store))`
    * — each micro-batch of (doc_id, text) extends the term-clustered
    * CHUNK-level index (create via `SearchOps.buildChunkIndex`, possibly
    * empty). Serve passages any time with
    * `SearchOps.chunkBm25FromIndex`. */
  def chunkIndexIngestSink(store: TableStore): (DataFrame, Long) => Unit =
    (batch, epochId) => SearchOps.chunkIndexIngestEpoch(store)(batch, epochId)
}
