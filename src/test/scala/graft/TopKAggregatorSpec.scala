package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("reduce/merge keep only k best with (score desc, id asc) tie-break") {
    val agg = TopK(3)
    val b = Seq(Scored(1, 0.9), Scored(2, 0.8), Scored(3, 0.7))
    // worse than the weakest → unchanged
    agg.reduce(b, Scored(9, 0.5)) shouldBe b
    // better → displaces the weakest
    agg.reduce(b, Scored(9, 0.85)).map(_.id) shouldBe Seq(1, 9, 2)
    // equal score → smaller id wins the tie
    agg.reduce(b, Scored(0, 0.7)).map(_.id) shouldBe Seq(1, 2, 0)
    agg.merge(b, Seq(Scored(7, 0.95), Scored(8, 0.1))).map(_.id) shouldBe Seq(7, 1, 2)
  }

  test("distributed: partial buffers stay bounded and the result is exact") {
    val rows = (1L to 1000L).map(i => (i % 7, i, (i % 97).toDouble / 97.0))
      .toDF("grp", "id", "score").repartition(8)
    val topk = udaf(TopK(4))
    val out = rows.groupBy("grp").agg(topk(col("id"), col("score")).as("top"))
      .select(col("grp"), posexplode(col("top"))).collect()
    out.length shouldBe 7 * 4
    // cross-check one group against a plain sort
    val expected = (1L to 1000L).filter(_ % 7 == 0)
      .map(i => (i, (i % 97).toDouble / 97.0))
      .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
    val got = out.filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
      .map(_.getStruct(2).getLong(0)).toSeq
    got shouldBe expected
  }
}
