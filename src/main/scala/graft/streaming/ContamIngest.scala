package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators.CorpusOps
import graft.sources.TableStore

/** Continuous DECONTAMINATION under ingest — the q213 epoch as a
  * streaming sink: every arriving micro-batch of documents is checked
  * against the static held-out benchmark gram set (bloom-pruned scan,
  * exact broadcast join) and its verdict rows land in the `contam`
  * table through the exactly-once epoch ledger, so contaminated docs
  * are flagged the moment they arrive and a release-time reader never
  * rescans the corpus. The accumulated table equals the monolithic
  * q63/q130 recomputation — q213's oracle-gated guarantee. */
object ContamIngest {

  /** Wire as `docs.writeStream.foreachBatch(contamIngestSink(store,
    * bench, prune))` — build `(bench, prune)` once with
    * `CorpusOps.benchGramSet` (the benchmark is known before ingest
    * begins) and create the `contam` table (possibly empty) first. */
  def contamIngestSink(store: TableStore, benchGrams: DataFrame,
      benchPrune: Option[Column]): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      CorpusOps.decontamIngestEpoch(store, benchGrams, benchPrune)(batch, epochId)
}
