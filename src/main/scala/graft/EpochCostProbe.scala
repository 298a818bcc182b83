package graft

import org.apache.spark.sql.SparkSession

/** q199 epoch-cost probe (VERDICT r12 next #3 — the unmet r11 #2 "done"
  * criterion): run the streaming dedup ingest over a scaled corpus with
  * N equal doc_id slices and trace each epoch's wall. Batch size stays
  * constant per epoch while the signature store GROWS by one batch per
  * epoch, so a flat per-epoch wall demonstrates epoch cost tracks BATCH
  * size, not accumulated store size — the property the r12 kernel lost
  * (store-proportional ~31 s/epoch by epoch 4 at sf0.1).
  *
  * Usage: runMain graft.EpochCostProbe [corpusDir] [artifact]
  * (default: the ScaleBench 10× replica at /tmp/graft_sf1, which must
  * already exist, and scale_r13_epoch.json). SPARK_GRAFT_EPOCH_SLICES
  * overrides the slice count (default 8); SPARK_GRAFT_EPOCH_FILES sets
  * `spark.graft.state.filesPerEpoch` (the candidate-prune file-width
  * lever — see Dedup.stateLayout) for the run. */
object EpochCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val artifact = if (args.length > 1) args(1) else "scale_r13_epoch.json"
    val slices = sys.env.get("SPARK_GRAFT_EPOCH_SLICES").map(_.toInt).getOrElse(8)
    val filesPerEpoch = sys.env.get("SPARK_GRAFT_EPOCH_FILES").map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    filesPerEpoch.foreach(n =>
      spark.conf.set("spark.graft.state.filesPerEpoch", n.toString))
    // SPARK_GRAFT_EPOCH_DENSE: remap doc ids to a dense 1..N space first.
    // The ScaleBench replicas offset each replica by 10^7, so q199's
    // doc_id-RANGE slicing lands whole replicas in some epochs and none
    // in others — fine for the gated query, but this probe's control
    // variable is CONSTANT batch size, which needs dense ids. Order is
    // preserved, so the strictly-increasing-ingest contract holds.
    val corpusDir = if (!sys.env.contains("SPARK_GRAFT_EPOCH_DENSE")) dir else {
      val out = java.nio.file.Files.createTempDirectory("graft-epoch-dense")
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("doc_id",
          row_number().over(Window.orderBy("doc_id")).cast("long"))
        .write.parquet(s"$out/documents.parquet")
      out.toString
    }
    sys.props("graft.epochTrace") = "1"
    operators.Dedup.epochTrace.clear()
    operators.Dedup.skipTrace.clear()
    val t0 = System.nanoTime()
    val rows = operators.Dedup.q199Impl(slices = slices)(spark, corpusDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val epochs = {
      val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val it = operators.Dedup.epochTrace.iterator()
      while (it.hasNext) b += it.next()
      b.sortBy(_._1).toSeq
    }
    val body = epochs.map { case (e, s) => s"""  {"epoch": $e, "sec": ${num(s, 2)}}""" }
      .mkString("[\n", ",\n", "\n]")
    // the bucketed store's file-skip evidence (r14): every pruned store
    // read's scheduled-vs-total file counts, in execution order — a
    // growing `total` with a bounded `read` is the scan term staying
    // probe-proportional while the store grows
    val skips = {
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      val it = operators.Dedup.skipTrace.iterator()
      while (it.hasNext) b += it.next()
      b.toSeq
    }
    val skipBody = skips.map { case (tag, t, r) =>
      s"""  {"read": "$tag", "files_total": $t, "files_read": $r}"""
    }.mkString("[\n", ",\n", "\n]")
    val doc =
      s"""{"probe": "q199_epoch_cost", "corpus": "$dir", "slices": $slices,
         | "files_per_epoch": ${filesPerEpoch.getOrElse(8)},
         | "dense_ids": ${sys.env.contains("SPARK_GRAFT_EPOCH_DENSE")},
         | ${Provenance.jsonFields},
         | "note": "equal doc_id batches; store grows one batch per epoch; flat per-epoch sec = batch-proportional cost",
         | "survivor_rows": $rows, "total_sec": ${num(total, 2)},
         | "epochs": $body,
         | "store_reads": $skipBody}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[epoch-probe] rows=$rows total=${num(total, 2)}s epochs=" +
      epochs.map { case (e, s) => s"$e:${num(s, 2)}" }.mkString(","))
    spark.stop()
  }
}
