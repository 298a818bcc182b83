package graft

import graft.ingest.Normalizer

class NormalizerSpec extends SparkSpec {
  import spark.implicits._

  private def products = Seq(
    ("p1", " Fruits ", "Citrus"),
    ("p2", "fruits", "citrus"),       // case/space variant of the same dim
    ("p3", "Fruits", "Berries"),
    ("p4", "Dairy", null),            // NULL subcategory → 'general'
    ("p5", null, null)                // NULL category → 'uncategorized'
  ).toDF("productid", "category", "subcategory")

  test("dims are distinct on normalized keys (case/trim-insensitive)") {
    val n = Normalizer.normalize(products)
    n.categories.collect().map(_.getString(1)).sorted.toSeq shouldBe
      Seq("dairy", "fruits", "uncategorized")
    n.subcategories.count() shouldBe 4 // fruits×(citrus,berries), dairy×general, uncategorized×general
  }

  test("backfill resolves every product; 3-way verify join finds no gaps") {
    val n = Normalizer.normalize(products)
    n.products.filter("subcategoryid IS NULL").count() shouldBe 0
    Normalizer.verify(n) shouldBe 0
  }

  test("surrogate keys are deterministic across runs") {
    val a = Normalizer.normalize(products).categories.collect().map(r => r.getString(1) -> r.getString(0)).toMap
    val b = Normalizer.normalize(products).categories.collect().map(r => r.getString(1) -> r.getString(0)).toMap
    a shouldBe b
  }
}
