package graft

import org.apache.spark.sql.functions._

/** Invariants for the graph-iteration operators (PageRank, canonical
  * selection) on the real sf0.001 tables — conservation and membership
  * properties beyond the oracle's value-equality check.
  */
class GraphOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val R = 1000000000000L

  test("q154 PageRank: positive scores, near-conserved mass, symmetric degrees") {
    val rows = operators.Extras.q154.build(spark, dir)
      .select("part_key", "deg", "pr_e12").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.length should be > 0
    all(rows.map(_._3)) should be > 0L
    // every integer division truncates: per node and per round the loss is
    // < deg (contrib) + 100 (damping) + 100 (base), so total mass can only
    // drift DOWN from R, and by far less than 1% on this graph
    val mass = rows.map(_._3).sum
    mass should be <= R
    mass.toDouble should be > R * 0.99
    // a node with more co-purchase partners than another, all else equal,
    // should not rank lower by an order of magnitude — sanity: the max-deg
    // node scores above the global minimum score
    val maxDegNode = rows.maxBy(_._2)
    maxDegNode._3 should be > rows.map(_._3).min
  }

  test("q156 canonical selection: one canonical per component, max quality wins") {
    val rows = operators.DedupClusters.q156.build(spark, dir)
      .select("doc_id", "component", "quality_score", "canonical_id", "is_canonical")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    if (rows.nonEmpty) {
      rows.groupBy(_._2).foreach { case (comp, members) =>
        // exactly one canonical, and it is a member of the component
        members.count(_._5) shouldBe 1
        val canon = members.find(_._5).get
        canon._4 shouldBe canon._1
        all(members.map(_._4)) shouldBe canon._1
        // the canonical has the component's max quality; ties to min doc_id
        val bestQ = members.map(_._3).max
        canon._3 shouldBe bestQ
        canon._1 shouldBe members.filter(_._3 == bestQ).map(_._1).min
        // component id is still the min member id (q71's labeling)
        comp shouldBe members.map(_._1).min
      }
    }
  }
}
