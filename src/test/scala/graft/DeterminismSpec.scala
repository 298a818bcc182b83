package graft

/** Partition-count invariance — the property every exactness claim in
  * this engine rests on: integer/decimal arithmetic with deterministic
  * tiebreaks must produce IDENTICAL results whether a shuffle runs over
  * 2 partitions or 32 (float summation would not). Representative picks:
  * an iterative graph fixpoint (q154), a histogram-quantile pick (q162),
  * and an argmax aggregation (q158).
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectAt(partitions: String,
                        q: graft.core.QueryDef): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", partitions)
      q.build(spark, dir).collect().map(_.toString).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (q <- Seq(graft.operators.Extras.q154, graft.operators.Extras.q162,
                graft.operators.TextAnalysis.q158, graft.operators.Extras.q160,
                graft.operators.CorpusOps.q151, graft.operators.EventsOps.q171,
                graft.operators.CorpusOps.q192, graft.operators.CorpusOps.q194))
    test(s"${q.name} is bit-identical at 2 vs 32 shuffle partitions") {
      collectAt("2", q) shouldBe collectAt("32", q)
    }
}
