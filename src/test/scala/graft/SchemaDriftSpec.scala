package graft

/** Early-warning canary for driver-regenerated test data.
  *
  * The test tables under /root/testdata are rebuilt between rounds, and a
  * rebuild has changed a column's physical encoding before: round 7 moved
  * `events.ts` from parquet TIMESTAMP(NANOS) to timestamp[us]-without-tz
  * (read as TIMESTAMP_NTZ), which silently broke all 10 event-time and
  * watermark queries while every schema-stable query kept passing. The
  * failure surfaced as ten scattered runtime errors, not as one clear
  * signal.
  *
  * This spec pins, per table, the expected columns and the ACCEPTED set of
  * Spark types per column — every encoding the engine's normalization layer
  * ([[graft.core.Tables]]) is known to handle. A regeneration that drifts
  * outside that set fails HERE, naming the table, the column, and the new
  * type: a one-minute diagnosis pointing at the exact normalization arm to
  * extend, instead of a cross-query error hunt.
  */
class SchemaDriftSpec extends SparkSpec {

  /** All three driver dirs, not just the smoke dir: Verify reads sf0.01
    * and Bench sf0.1, and a regeneration can drift one dir's encoding
    * without the others (VERDICT r8 missing-#2). Absent dirs skip —
    * the canary must not fail a checkout without the full testdata. */
  private val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => sf -> s"/root/testdata/$sf")
    .filter { case (_, d) => new java.io.File(d).isDirectory }

  /** table -> (column -> accepted dataType.simpleString values, in column
    * order). Multiple accepted types = encodings the loaders normalize
    * (events.ts via [[graft.core.Tables.tsAsTimestamp]]); a single type =
    * any change needs an explicit decision, so the canary stays strict. */
  private val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      // date_trunc/cast-to-date tolerate either timestamp flavor
      "o_orderdate" -> Set("timestamp", "timestamp_ntz"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz")),
    "events" -> Seq(
      "event_id" -> Set("bigint"),
      // every encoding Tables.tsAsTimestamp normalizes: nanos-as-long
      // (legacy TIMESTAMP(NANOS) under nanosAsLong), NTZ micros, and
      // plain session-zone timestamp
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  for ((table, cols) <- expected; (sf, sfDir) <- dirs)
    test(s"$table schema matches the encodings the engine normalizes ($sf)") {
      val schema = graft.core.Tables.load(spark, sfDir, table).schema
      withClue(s"$table columns drifted — driver regenerated the table " +
        s"with a new layout; extend the ${table} loader/queries, then " +
        "update this canary:\n") {
        schema.fields.map(_.name).toSeq shouldBe cols.map(_._1)
      }
      for (f <- schema.fields) {
        val accepted = cols.toMap.apply(f.name)
        withClue(s"$table.${f.name} arrived as ${f.dataType.simpleString}, " +
          s"outside the normalized set $accepted — add a normalization arm " +
          "(see Tables.tsAsTimestamp for the events.ts precedent), then " +
          "update this canary:\n") {
          accepted should contain(f.dataType.simpleString)
        }
      }
    }

  for ((sf, sfDir) <- dirs)
    test(s"events.ts normalizes to session-zone timestamp whatever the encoding ($sf)") {
      graft.core.Tables.events(spark, sfDir).schema("ts").dataType.simpleString shouldBe "timestamp"
    }
}
