package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond parquet (SURVEY.md §2.1 sources):
  *
  *  - **JSON**: schema-on-read, always with an EXPLICIT schema and
  *    FAILFAST — schema inference is a full extra pass over the data and
  *    silently widens types, both wrong at 100 TB.
  *  - **ORC**: columnar with the same predicate-pushdown/column-pruning
  *    contract as parquet (asserted in FormatsSpec).
  *  - CSV is handled by the ingest staging layer (all-string schema-on-read
  *    → conform; see [[graft.ingest.IngestPipeline]]).
  *  - Avro requires the `spark-avro` connector, which is not bundled with
  *    this distribution — deliberately unsupported rather than half-wired.
  *
  * All readers return plain DataFrames, so every downstream operator is
  * format-agnostic.
  */
object Formats {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
