package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 appears here as a named query
  * with (where SQL-expressible) a DuckDB oracle; the driver hash-compares
  * the two on sf0.01.
  */
object SparkEntry {

  private def modules: Seq[QueryDef] =
    operators.Analytics.all ++ operators.Windows.all ++ operators.Audits.all ++
      operators.DmlQueries.all ++ operators.Normalization.all ++ operators.EventsOps.all ++
      operators.TextAnalysis.all ++ operators.Dedup.all ++ operators.Similarity.all ++
      operators.Multimodal.all ++ operators.SqlEntry.all ++ operators.NativeOps.all ++
      operators.CorpusOps.all ++ operators.SetOps.all ++ operators.AsofJoin.all ++
      operators.Extras.all ++ operators.DedupClusters.all ++ operators.IngestGate.all ++
      operators.BloomJoin.all ++ operators.SearchOps.all ++ operators.PassageOps.all ++
      operators.Warehouse.all ++ operators.HybridOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.q10.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
