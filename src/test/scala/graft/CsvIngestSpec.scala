package graft

import java.nio.file.Files
import org.apache.spark.sql.types.IntegerType
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline._
import graft.schema.AmazonFresh

/** §2.1 S1 — CSV → all-string staging → pipeline, from real CSV files
  * (schema-on-read, never inferSchema; reference TC:81-103). */
class CsvIngestSpec extends SparkSpec {

  test("CSV lands all-string, conforms through the pipeline") {
    val dir = tempDir("graft-csv")
    Files.writeString(dir.resolve("customers.csv"),
      """customerid,name,age,gender,city,state,country,signupdate,primemember
        |898ca408-050f-4a22-9b07-6e5ed27ab101,  Alice  , 30 ,F,Springfield,IL,USA,1/5/2024,Yes
        |BAD-ID,Bob,41,M,Portland,OR,USA,12/31/2023,no
        |898ca408-050f-4a22-9b07-6e5ed27ab103,Carol,,F,Austin,TX,USA,2024-01-15,
        |""".stripMargin)

    val staging = spark.read
      .schema(AmazonFresh.staging(AmazonFresh.customers))
      .option("header", "true")
      .csv(dir.toString)

    staging.schema.fields.map(_.dataType).distinct.toSeq shouldBe
      Seq(org.apache.spark.sql.types.StringType)
    staging.count() shouldBe 3

    val spec = EntitySpec("customers", "customerid", Map(
      "customerid" -> AsUuid, "age" -> AsTyped(IntegerType),
      "signupdate" -> AsDateMdy, "primemember" -> AsBool))
    val r = IngestPipeline.run(staging, spec)
    val (clean, quarantined) = r.counts
    clean + quarantined shouldBe 3
    clean shouldBe 3 // BAD-ID row was repaired, not dropped
    val alice = r.clean.filter("name = 'Alice'").head()
    alice.getInt(2) shouldBe 30
    alice.getDate(7).toString shouldBe "2024-01-05"
    alice.getBoolean(8) shouldBe true
  }
}
