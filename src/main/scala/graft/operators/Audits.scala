package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.functions.CleanFunctions

/** Constraint-audit suite (SURVEY.md §2.8) + cleaning scalar functions
  * (§2.7) as gate-checked queries. These reproduce the reference's
  * data-quality dashboards (TablesCreated-Imported.sql:1130-1183) over the
  * test tables.
  *
  * Scale: every audit is a pure aggregate (count / left-anti count) —
  * partial+final aggregation, one shuffle on the audited key; no collect,
  * no windows.
  */
object Audits {

  /** §2.8 C1 — duplicate-PK audit `count(*) - count(DISTINCT pk)` per table
    * (reference TablesCreated-Imported.sql:1139-1145). */
  val q26 = QueryDef(
    "q26_audit_dup_pk",
    """SELECT
      |  (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS dup_orders,
      |  (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer) AS dup_customers,
      |  (SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part) AS dup_parts,
      |  (SELECT COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier) AS dup_suppliers""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orders"))
      .crossJoin(Tables.customer(s, d).agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("dup_customers")))
      .crossJoin(Tables.part(s, d).agg((count(lit(1)) - countDistinct(col("p_partkey"))).as("dup_parts")))
      .crossJoin(Tables.supplier(s, d).agg((count(lit(1)) - countDistinct(col("s_suppkey"))).as("dup_suppliers")))
  }

  /** §2.8 C2 — orphan-FK audit per FK edge via anti-join counts (reference
    * TablesCreated-Imported.sql:1148-1166 LEFT JOIN … IS NULL). */
  val q27 = QueryDef(
    "q27_audit_orphans",
    """SELECT
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS lineitem_no_order,
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS lineitem_no_part,
      |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      |     (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS lineitem_no_supplier,
      |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |     (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS order_no_customer""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    def orphans(fact: org.apache.spark.sql.DataFrame, fk: String,
                parent: org.apache.spark.sql.DataFrame, pk: String, as: String) =
      fact.select(col(fk).as(pk)).join(parent.select(pk), Seq(pk), "left_anti")
        .agg(count(lit(1)).as(as))
    orphans(l, "l_orderkey", o, "o_orderkey", "lineitem_no_order")
      .crossJoin(orphans(l, "l_partkey", Tables.part(s, d), "p_partkey", "lineitem_no_part"))
      .crossJoin(orphans(l, "l_suppkey", Tables.supplier(s, d), "s_suppkey", "lineitem_no_supplier"))
      .crossJoin(orphans(o, "o_custkey", Tables.customer(s, d), "c_custkey", "order_no_customer"))
  }

  /** §2.8 C1/C5 — null-key audit (reference TablesCreated-Imported
    * .sql:1170-1176). */
  val q28 = QueryDef(
    "q28_audit_null_keys",
    """SELECT
      |  (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL OR o_custkey IS NULL) AS orders_null_keys,
      |  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL OR l_partkey IS NULL OR l_suppkey IS NULL) AS lineitem_null_keys,
      |  (SELECT COUNT(*) FROM customer WHERE c_custkey IS NULL) AS customer_null_keys""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .agg(count_if(col("o_orderkey").isNull || col("o_custkey").isNull).as("orders_null_keys"))
      .crossJoin(Tables.lineitem(s, d).agg(count_if(
        col("l_orderkey").isNull || col("l_partkey").isNull || col("l_suppkey").isNull).as("lineitem_null_keys")))
      .crossJoin(Tables.customer(s, d).agg(count_if(col("c_custkey").isNull).as("customer_null_keys")))
  }

  /** §2.7 F6/F7/F14 — guarded M/D/YYYY date parsing (reference
    * TablesCreated-Imported.sql:174, 548-555): derive a M/D/YYYY string,
    * regex-gate it, parse back to DATE. */
  val q29 = QueryDef(
    "q29_date_parse",
    """SELECT event_id, mdy, CAST(strptime(mdy, '%m/%d/%Y') AS DATE) AS parsed FROM (
      |  SELECT event_id,
      |         CAST(month(ts) AS VARCHAR) || '/' || CAST(day(ts) AS VARCHAR) || '/' || CAST(year(ts) AS VARCHAR) AS mdy
      |  FROM events WHERE event_id < 500) t
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        concat_ws("/", month(col("ts")), dayofmonth(col("ts")), year(col("ts"))).as("mdy"))
      .withColumn("parsed", CleanFunctions.parseDateMdy(col("mdy")))
      .orderBy("event_id")
  }

  /** §2.7 F16 — deterministic UUIDv5-style surrogate keys replacing
    * `gen_random_uuid()` (reference All-Tasks-of-SQL.sql:97, 330;
    * SURVEY.md §7.4 determinism requirement). */
  val q30 = QueryDef(
    "q30_uuid5_keys",
    s"""SELECT c_custkey, ${CleanFunctions.uuid5Sql("customer", "c_custkey")} AS customer_uuid
       |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"), CleanFunctions.uuid5("customer", col("c_custkey")).as("customer_uuid"))
      .orderBy("c_custkey")
  }

  /** §2.7 F1-F4, F15, F18 — the cleaning vocabulary end-to-end on derived
    * dirty strings: TRIM, LOWER, NULLIF(blank), COALESCE, boolean-parse
    * (reference TablesCreated-Imported.sql:111-178 conform layer). */
  val q31 = QueryDef(
    "q31_clean_vocabulary",
    """SELECT event_id,
      |  NULLIF(TRIM(padded), '') AS cleaned,
      |  COALESCE(NULLIF(TRIM(padded), ''), 'missing') AS filled,
      |  CASE WHEN LOWER(TRIM(boolish)) IN ('yes','y','true','1') THEN TRUE
      |       WHEN LOWER(TRIM(boolish)) IN ('no','n','false','0','') THEN FALSE
      |       ELSE NULL END AS parsed_flag
      |FROM (
      |  SELECT event_id,
      |         CASE WHEN event_id % 5 = 0 THEN '  ' ELSE '  ' || event_type || '  ' END AS padded,
      |         CASE event_id % 6 WHEN 0 THEN 'Yes' WHEN 1 THEN 'n' WHEN 2 THEN 'TRUE'
      |                           WHEN 3 THEN '0' WHEN 4 THEN '' ELSE 'maybe' END AS boolish
      |  FROM events WHERE event_id < 1000) t
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import CleanFunctions._
    Tables.events(s, d)
      .filter(col("event_id") < 1000)
      .select(col("event_id"),
        when(col("event_id") % 5 === 0, "  ")
          .otherwise(concat(lit("  "), col("event_type"), lit("  "))).as("padded"),
        (col("event_id") % 6).cast("int").as("m6"), col("event_type"))
      .withColumn("boolish",
        when(col("m6") === 0, "Yes").when(col("m6") === 1, "n")
          .when(col("m6") === 2, "TRUE").when(col("m6") === 3, "0")
          .when(col("m6") === 4, "").otherwise("maybe"))
      .select(col("event_id"),
        blankToNull(col("padded")).as("cleaned"),
        coalesce(blankToNull(col("padded")), lit("missing")).as("filled"),
        parseBool(col("boolish")).as("parsed_flag"))
      .orderBy("event_id")
  }

  val all: Seq[QueryDef] = Seq(q26, q27, q28, q29, q30, q31)
}
