package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.CleanFunctions._

class CleanFunctionsSpec extends SparkSpec {

  /** Draw n deterministic samples from a generator (no scalatestplus
    * bridge in the offline cache, so we sample by hand). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  import spark.implicits._

  test("validUuid accepts canonical and case-variant uuids, rejects garbage") {
    val df = Seq(
      "898ca408-050f-4a22-9b07-6e5ed27ab123", // canonical
      "898CA408-050F-4A22-9B07-6E5ED27AB123", // uppercase (reference ~* semantics)
      "not-a-uuid", "12345", "", "898ca408-050f-4a22-9b07" // malformed
    ).toDF("u").select(col("u"), validUuid(col("u")).as("ok"))
    df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap shouldBe Map(
      "898ca408-050f-4a22-9b07-6e5ed27ab123" -> true,
      "898CA408-050F-4A22-9B07-6E5ED27AB123" -> true,
      "not-a-uuid" -> false, "12345" -> false, "" -> false,
      "898ca408-050f-4a22-9b07" -> false)
  }

  test("parseBool maps the reference vocabulary, NULL otherwise") {
    val cases = Seq(
      "Yes" -> Some(true), "y" -> Some(true), "TRUE" -> Some(true), "1" -> Some(true),
      "No" -> Some(false), "n" -> Some(false), "false" -> Some(false), "0" -> Some(false),
      "" -> Some(false), "  yes " -> Some(true), // trimmed
      "maybe" -> None, "2" -> None)
    val got = cases.map(_._1).toDF("b")
      .select(parseBool(col("b")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    got.toSeq shouldBe cases.map(_._2)
  }

  test("parseDateMdy: regex-guarded, lenient 1-2 digit fields, bad shapes → NULL") {
    val got = Seq("1/5/2024", "12/31/2023", "2024-01-15", "Jan 5 2024", "13/45/2024")
      .toDF("d").select(parseDateMdy(col("d")).as("v")).collect()
      .map(r => Option(r.getDate(0)).map(_.toString))
    got.toSeq shouldBe Seq(Some("2024-01-05"), Some("2023-12-31"), None, None, None)
  }

  test("blankToNull and trimAll reproduce NULLIF(trim(x),'')") {
    val df = Seq(("  a  ", "   "), ("b", "")).toDF("x", "y")
    val t = trimAll(df)
    t.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", ""), ("b", ""))
    val n = df.select(blankToNull(col("x")).as("x"), blankToNull(col("y")).as("y"))
    n.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSeq shouldBe
      Seq((Some("a"), None), (Some("b"), None))
  }

  test("uuid5 is deterministic, canonical-shaped, distinct across keys") {
    val df = Seq("k1", "k2", "k1").toDF("k")
      .select(uuid5("test", col("k")).as("u"))
    val us = df.collect().map(_.getString(0))
    us(0) shouldBe us(2)
    us(0) should not be us(1)
    all(us) should fullyMatch regex UuidRegex.drop(1).dropRight(1)
  }

  test("property: parseBool is total on the vocabulary and NULL elsewhere") {
    val vocabTrue = samples(Gen.oneOf("yes", "y", "true", "1", "YES", "True"), 20)
    val vocabFalse = samples(Gen.oneOf("no", "n", "false", "0", "", "NO"), 20)
    val other = samples(Gen.alphaStr.suchThat(s =>
      !Set("yes", "y", "true", "no", "n", "false", "").contains(s.toLowerCase)), 20)
    val rows = (vocabTrue ++ vocabFalse ++ other).toDF("b")
      .select(col("b"), parseBool(col("b")).as("v")).collect()
    rows.foreach { r =>
      val s = r.getString(0).trim.toLowerCase
      if (Set("yes", "y", "true", "1").contains(s)) r.getBoolean(1) shouldBe true
      else if (Set("no", "n", "false", "0", "").contains(s)) r.getBoolean(1) shouldBe false
      else r.isNullAt(1) shouldBe true
    }
  }

  test("property: uuid5 output always matches the canonical regex") {
    val keys = samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 40)
    val us = keys.toDF("k").select(uuid5("ns", col("k"))).collect().map(_.getString(0))
    all(us) should fullyMatch regex UuidRegex.drop(1).dropRight(1)
  }
}
