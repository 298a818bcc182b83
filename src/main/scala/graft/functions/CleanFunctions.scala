package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's cleaning vocabulary as reusable column functions.
  * Pure compositions of built-in (codegen'd) functions — no UDFs, so every
  * use stays inside WholeStageCodegen (SURVEY.md §2.7, §7.2).
  */
object CleanFunctions {

  /** Canonical UUID shape, case-insensitive
    * (reference TablesCreated-Imported.sql:245-247 `~*`). */
  val UuidRegex = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  def validUuid(c: Column): Column = c.rlike(UuidRegex)

  /** trim + lowercase, the reference's `trim(x)::uuid` normalization
    * (TablesCreated-Imported.sql:111). */
  def normalizeUuid(c: Column): Column = lower(trim(c))

  /** Blank→NULL, the reference's `NULLIF(trim(x),'')`
    * (TablesCreated-Imported.sql:145-146, 169-173). */
  def blankToNull(c: Column): Column = nullif(trim(c), lit(""))

  /** Trim every string column in place
    * (reference TablesCreated-Imported.sql:469-480 trims staging tables). */
  def trimAll(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType) trim(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Guarded M/D/YYYY date parse: regex gate first (reference
    * TablesCreated-Imported.sql:174 `^\d{1,2}/\d{1,2}/\d{4}$`), then
    * `to_date` with the lenient 1-2-digit pattern (§2.7 F6). Rows failing
    * the gate become NULL, never a runtime error. */
  def parseDateMdy(c: Column): Column =
    when(c.rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$"), try_to_date(c, "M/d/yyyy"))
      .otherwise(lit(null).cast("date"))

  /** Boolean vocabulary parse (reference TablesCreated-Imported.sql:175,
    * 202-203, 497-501): yes/y/true/1→true; no/n/false/0/''→false; else NULL. */
  def parseBool(c: Column): Column = {
    val v = lower(trim(c))
    when(v.isin("yes", "y", "true", "1"), lit(true))
      .when(v.isin("no", "n", "false", "0", ""), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Deterministic content-derived UUID (v5-style) replacing the
    * reference's `gen_random_uuid()` (All-Tasks-of-SQL.sql:97, 330;
    * TablesCreated-Imported.sql:254) so runs are reproducible and
    * oracle-comparable (SURVEY.md §7.4). Layout: md5 hex reformatted
    * 8-4-4-4-12 with version nibble '5' and variant nibble '8'. */
  def uuid5(namespace: String, naturalKey: Column): Column = {
    val h = md5(concat(lit(namespace + ":"), naturalKey.cast("string")))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("5"), substring(h, 14, 3)),
      concat(lit("8"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** DuckDB-SQL rendering of [[uuid5]] for oracle parity. */
  def uuid5Sql(namespace: String, keyExpr: String): String = {
    val h = s"md5('$namespace:' || CAST($keyExpr AS VARCHAR))"
    s"(substr($h,1,8) || '-' || substr($h,9,4) || '-5' || substr($h,14,3) || '-8' || substr($h,18,3) || '-' || substr($h,21,12))"
  }
}
