package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.CleanFunctions._

/** The Task-12 normalization migration (SURVEY.md §3.3; reference
  * All-Tasks-of-SQL.sql:319-527) replayed over the `part` table:
  * brand → categories dim, (brand, type) → subcategories dim, then the
  * fact backfilled with the surrogate FK via the case/trim-insensitive
  * join the reference uses (AT:358, 369-371).
  *
  * Surrogate keys are deterministic uuid5 (SURVEY.md §7.4) so the whole
  * migration is reproducible and oracle-comparable. Scale: dims are
  * distinct-aggregates of the fact (one shuffle), the backfill join
  * broadcasts the dims.
  */
object Normalization {

  private def catUuidSql = uuid5Sql("category", "LOWER(TRIM(p_brand))")
  private def subcatUuidSql =
    uuid5Sql("subcategory", "LOWER(TRIM(p_brand)) || '|' || LOWER(TRIM(p_type))")

  /** Build the `categories` dim (reference All-Tasks-of-SQL.sql:344-348). */
  val q37 = QueryDef(
    "q37_normalize_categories",
    s"""SELECT DISTINCT ${catUuidSql} AS categoryid, LOWER(TRIM(p_brand)) AS category
       |FROM part ORDER BY category""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(lower(trim(col("p_brand"))).as("category")).distinct()
      .select(uuid5("category", col("category")).as("categoryid"), col("category"))
      .orderBy("category")
  }

  /** Build `subcategories` keyed to categories via the case-insensitive
    * join (reference All-Tasks-of-SQL.sql:351-359). */
  val q38 = QueryDef(
    "q38_normalize_subcategories",
    s"""SELECT DISTINCT ${subcatUuidSql} AS subcategoryid, ${catUuidSql} AS categoryid,
       |  LOWER(TRIM(p_type)) AS subcategory
       |FROM part ORDER BY categoryid, subcategory""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(lower(trim(col("p_brand"))).as("category"), lower(trim(col("p_type"))).as("subcategory"))
      .distinct()
      .select(
        uuid5("subcategory", concat_ws("|", col("category"), col("subcategory"))).as("subcategoryid"),
        uuid5("category", col("category")).as("categoryid"),
        col("subcategory"))
      .orderBy("categoryid", "subcategory")
  }

  /** Backfill the fact with its subcategory FK + verify by the reference's
    * 3-way join (All-Tasks-of-SQL.sql:366-372, 523-527). */
  val q39 = QueryDef(
    "q39_normalize_backfill",
    s"""WITH subcats AS (
       |  SELECT DISTINCT ${subcatUuidSql} AS subcategoryid,
       |    LOWER(TRIM(p_brand)) AS category, LOWER(TRIM(p_type)) AS subcategory
       |  FROM part)
       |SELECT p.p_partkey, sc.subcategoryid, sc.category, sc.subcategory
       |FROM part p
       |JOIN subcats sc ON LOWER(TRIM(p.p_brand)) = sc.category
       |               AND LOWER(TRIM(p.p_type)) = sc.subcategory
       |ORDER BY p.p_partkey""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val subcats = part
      .select(lower(trim(col("p_brand"))).as("category"), lower(trim(col("p_type"))).as("subcategory"))
      .distinct()
      .select(uuid5("subcategory", concat_ws("|", col("category"), col("subcategory"))).as("subcategoryid"),
        col("category"), col("subcategory"))
    part.select(col("p_partkey"),
        lower(trim(col("p_brand"))).as("category"), lower(trim(col("p_type"))).as("subcategory"))
      .join(broadcast(subcats), Seq("category", "subcategory"))
      .select("p_partkey", "subcategoryid", "category", "subcategory")
      .orderBy("p_partkey")
  }

  val all: Seq[QueryDef] = Seq(q37, q38, q39)
}
