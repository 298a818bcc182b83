package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline._
import graft.functions.CleanFunctions.UuidRegex

class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goodCust = "898ca408-050f-4a22-9b07-6e5ed27ab101"
  private val upperCust = "898CA408-050F-4A22-9B07-6E5ED27AB102"

  /** Dirty customers fixture covering FIXTURES.md §3 cases. */
  private def dirtyCustomers = Seq(
    (goodCust, "  Alice  ", " 30 ", "1/5/2024", "Yes"),
    (upperCust, "Bob", "41", "12/31/2023", "no"),
    ("not-a-uuid", "Carol", "", "2024-01-15", ""),      // bad pk, blank age, bad date
    ("12345", "Dave", "abc", "Jan 5 2024", "maybe")     // bad pk, garbage age/date/bool
  ).toDF("customerid", "name", "age", "signupdate", "primemember")

  private val custSpec = EntitySpec(
    name = "customers", pk = "customerid",
    conform = Map(
      "customerid" -> AsUuid, "age" -> AsTyped(IntegerType),
      "signupdate" -> AsDateMdy, "primemember" -> AsBool))

  test("pipeline conserves rows: clean + quarantined = input") {
    val r = IngestPipeline.run(dirtyCustomers, custSpec)
    val (c, q) = r.counts
    c + q shouldBe dirtyCustomers.count()
  }

  test("bad PKs are repaired deterministically to canonical uuids") {
    val r1 = IngestPipeline.run(dirtyCustomers, custSpec)
    val r2 = IngestPipeline.run(dirtyCustomers, custSpec)
    val ids1 = r1.clean.select("customerid").collect().map(_.getString(0)).sorted
    val ids2 = r2.clean.select("customerid").collect().map(_.getString(0)).sorted
    ids1 shouldBe ids2 // reproducible repair (uuid5, not gen_random_uuid)
    all(ids1) should fullyMatch regex UuidRegex.drop(1).dropRight(1)
  }

  test("conform produces reference cleaning semantics") {
    val r = IngestPipeline.run(dirtyCustomers, custSpec)
    val byName = r.clean.collect().map(r => r.getString(1) -> r).toMap
    byName("Alice").getInt(2) shouldBe 30                     // trimmed then cast
    byName("Alice").getDate(3).toString shouldBe "2024-01-05" // M/D/YYYY
    byName("Alice").getBoolean(4) shouldBe true
    byName("Bob").getString(0) shouldBe upperCust.toLowerCase // uuid normalized
    byName("Carol").isNullAt(2) shouldBe true                 // blank → NULL
    byName("Carol").isNullAt(3) shouldBe true                 // ISO date rejected by M/D/Y gate
    byName("Carol").getBoolean(4) shouldBe false              // '' → false
    byName("Dave").isNullAt(2) shouldBe true                  // garbage int → NULL
    byName("Dave").isNullAt(4) shouldBe true                  // 'maybe' → NULL
  }

  test("orphan FK rows are quarantined unless healing is enabled") {
    val parents = Seq(goodCust).toDF("customerid")
    val orders = Seq(
      ("898ca408-050f-4a22-9b07-6e5ed27ab201", goodCust, "10.50"),
      ("898ca408-050f-4a22-9b07-6e5ed27ab202", "898ca408-050f-4a22-9b07-6e5ed27ab999", "20.00")
    ).toDF("orderid", "customerid", "totalamount")
    val spec = EntitySpec(
      name = "orders", pk = "orderid",
      conform = Map("orderid" -> AsUuid, "totalamount" -> AsTyped(DecimalType(12, 2))),
      parents = Map("customerid" -> ("customerid", parents)))
    val r = IngestPipeline.run(orders, spec)
    r.clean.count() shouldBe 1
    r.quarantined.count() shouldBe 1
    val healed = IngestPipeline.run(orders, spec.copy(healOrphans = true))
    healed.clean.count() shouldBe 2
  }

  test("verifyCounts emits the staging/clean/quarantine dashboard") {
    val r = IngestPipeline.run(dirtyCustomers, custSpec)
    val counts = IngestPipeline.verifyCounts(dirtyCustomers, r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    counts("staging") shouldBe 4
    counts("staging") shouldBe counts("clean") + counts("quarantined")
  }
}
