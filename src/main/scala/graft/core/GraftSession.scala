package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Config posture (SURVEY.md §4 "Physical-execution defaults"):
  *  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join handling.
  *  - `spark.sql.shuffle.partitions` low (32) — local[32] test harness; on a
  *    real cluster this is sized to ~2-3x total cores / target 128-256 MB
  *    per shuffle partition at 100 TB.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // CBO consumes only catalog-table statistics (TableStore.registerCbo
      // after maintenance compactions); path-based reads — every ordinary
      // query — plan exactly as before
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Apply graft defaults to an existing session (e.g. one the driver built). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  def local(appName: String = "graft-test", cores: Int = 4): SparkSession = {
    val s = builder(appName, cores)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
