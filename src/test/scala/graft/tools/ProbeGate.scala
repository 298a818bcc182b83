package graft

import org.apache.spark.sql.SparkSession

/** Per-gate wall-time probe at bench scale (sf0.1): times one query from
  * SparkEntry a few times so per-batch-toll changes (shuffle width,
  * state-store fan-out) are measured, not guessed. Diagnostic main, like
  * [[Probe112]]/[[ProbeJoin]].
  *
  * Usage: runMain graft.ProbeGate <queryName> [sfDir] [reps]
  */
object ProbeGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q183_streaming_late_gate")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[probe] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
  }
}
