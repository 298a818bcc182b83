package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CleanFunctions.uuid5

/** The Task-12 3NF migration as a module (SURVEY.md §3.3; reference
  * All-Tasks-of-SQL.sql:319-527): products(category, subcategory) →
  * `categories` + `subcategories` dims + FK backfill, with the reference's
  * gap-fill defaults ('Uncategorized'/'General', AT:388-402) and
  * case/trim-insensitive matching (AT:358).
  *
  * Surrogate keys are deterministic uuid5 so the migration is
  * reproducible (SURVEY.md §7.4). Dims are distinct-aggregates (one
  * shuffle); the backfill join broadcasts the dims — products never
  * shuffles.
  */
object Normalizer {

  final case class Normalized(categories: DataFrame, subcategories: DataFrame,
                              products: DataFrame)

  def normalize(products: DataFrame): Normalized = {
    val keyed = products
      .withColumn("__cat", coalesce(lower(trim(col("category"))), lit("uncategorized")))
      .withColumn("__sub", coalesce(lower(trim(col("subcategory"))), lit("general")))

    val categories = keyed.select(col("__cat").as("category")).distinct()
      .select(uuid5("category", col("category")).as("categoryid"), col("category"))

    val subcategories = keyed.select(col("__cat").as("category"), col("__sub").as("subcategory"))
      .distinct()
      .select(
        uuid5("subcategory", concat_ws("|", col("category"), col("subcategory"))).as("subcategoryid"),
        uuid5("category", col("category")).as("categoryid"),
        col("subcategory"))

    val backfilled = keyed
      .withColumn("subcategoryid",
        uuid5("subcategory", concat_ws("|", col("__cat"), col("__sub"))))
      .drop("__cat", "__sub")

    Normalized(categories, subcategories, backfilled)
  }

  /** Verification 3-way join (reference AT:523-527): every product resolves
    * through subcategories to a category; returns unmatched count (0 = ok). */
  def verify(n: Normalized): Long =
    n.products.select("subcategoryid")
      .join(n.subcategories.select(col("subcategoryid"), col("categoryid")),
        Seq("subcategoryid"), "left")
      .join(n.categories.select(col("categoryid"), col("category").as("__cat_name")),
        Seq("categoryid"), "left")
      .filter(col("categoryid").isNull || col("__cat_name").isNull)
      .count()
}
