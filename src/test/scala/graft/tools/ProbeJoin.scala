package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc tuning probe for the stream-stream join gates' time-sliced
  * replay (q149/q187): sweeps slice duration × shuffle width on a replica
  * dir and prints wall seconds, so `EventsOps.StreamSliceHours` is a
  * measured constant, not a guess. Same diagnostic role as [[Probe112]].
  *
  * Usage: runMain graft.ProbeJoin <replicaDir> [q149|q187]
  */
object ProbeJoin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val which = args.lift(1).getOrElse("q149")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val grid = Seq((240L, 32))
    for ((sliceHours, parts) <- grid) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      val n = which match {
        case "q187" => operators.EventsOps.q187Impl(sliceHours = sliceHours)(spark, dir).count()
        case _ => operators.EventsOps.q149Impl(sliceHours = sliceHours)(spark, dir).count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-join] $which sliceHours=$sliceHours parts=$parts -> $sec%.1fs ($n rows)")
    }
    spark.stop()
  }
}
