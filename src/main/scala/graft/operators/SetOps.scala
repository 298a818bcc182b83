package graft.operators

import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}

/** Set operations — not used by the reference (SURVEY.md §2.6 verified
  * none exist) but part of a complete engine surface: UNION ALL, UNION
  * (distinct), INTERSECT, EXCEPT with bag/set semantics matched to SQL.
  */
object SetOps {

  val q64 = QueryDef(
    "q64_set_operations",
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM building UNION ALL SELECT c_custkey FROM rich) t) AS union_all_n,
      |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM rich) t) AS union_distinct_n,
      |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich) t) AS intersect_n,
      |  (SELECT COUNT(*) FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich) t) AS except_n""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    building.unionAll(rich).agg(count(lit(1)).as("union_all_n"))
      .crossJoin(building.union(rich).distinct().agg(count(lit(1)).as("union_distinct_n")))
      .crossJoin(building.intersect(rich).agg(count(lit(1)).as("intersect_n")))
      .crossJoin(building.except(rich).agg(count(lit(1)).as("except_n")))
  }

  /** Bag-semantics set ops (q64 covers the DISTINCT forms): INTERSECT ALL
    * keeps min(multiplicity), EXCEPT ALL subtracts multiplicities — the
    * forms that matter when the key legitimately repeats (a customer with
    * k orders appears k times). Spark's intersectAll/exceptAll are
    * hash-aggregate + join plans, no sorts. */
  val q136 = QueryDef(
    "q136_set_ops_all",
    """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0),
      |b AS (SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0)
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) t) AS intersect_all_n,
      |  (SELECT COUNT(*) FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t) AS except_all_n,
      |  (SELECT CAST(COALESCE(SUM(k), 0) AS BIGINT)
      |     FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) t) AS except_all_key_sum""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey").as("k"))
    val b = o.filter(col("o_orderkey") % 3 === 0).select(col("o_custkey").as("k"))
    a.intersectAll(b).agg(count(lit(1)).as("intersect_all_n"))
      .crossJoin(a.exceptAll(b).agg(count(lit(1)).as("except_all_n")))
      .crossJoin(a.exceptAll(b).agg(
        coalesce(sum(col("k")), lit(0L)).as("except_all_key_sum")))
  }

  val all: Seq[QueryDef] = Seq(q64, q136)
}
