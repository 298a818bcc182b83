package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "hello media".getBytes("UTF-8"), "png", 640, 480),
    MediaRow(2L, Array.tabulate(256)(_.toByte), "jpeg", 320, 240),
    MediaRow(3L, Array.emptyByteArray, "png", 64, 48)
  ).toDS()

  test("decodeAll runs partition-parallel and preserves ids/batch shape") {
    val out = Multimodal.decodeAll(media.repartition(3), outW = 224, outH = 224)
    val rows = out.collect().sortBy(_.media_id)
    rows.map(_.media_id).toSeq shouldBe Seq(1L, 2L, 3L)
    all(rows.map(_.out_width)) shouldBe 224
    all(rows.map(_.features.length)) shouldBe FakeCodec.FeatureDim
  }

  test("stub codec is deterministic and histogram-normalized") {
    val r = MediaRow(9L, "aabb".getBytes("UTF-8"), "png", 1, 1)
    val f1 = FakeCodec.decode(r, 8, 8)
    val f2 = FakeCodec.decode(r, 8, 8)
    f1.features.toSeq shouldBe f2.features.toSeq
    f1.features.sum shouldBe 1.0f +- 1e-5f // histogram sums to 1
    f1.n_bytes shouldBe 4
  }

  test("frame sampling yields every stride-th chunk") {
    val r = MediaRow(9L, Array.tabulate(100)(_.toByte), "mp4", 1, 1)
    val frames = FakeCodec.sampleFrames(r, stride = 2, frameBytes = 10)
    frames.length shouldBe 5 // chunks 0,2,4,6,8
    frames.head.toSeq shouldBe (0 until 10).map(_.toByte)
  }

  test("real WAV codec round-trips every sample exactly") {
    import Multimodal.AudioCodec
    val (id, n) = (42L, 357)
    val wav = AudioCodec.encodeWav(id, n)
    // a real RIFF/WAVE container, not raw PCM
    new String(wav.take(4), "US-ASCII") shouldBe "RIFF"
    new String(wav.slice(8, 12), "US-ASCII") shouldBe "WAVE"
    val dec = AudioCodec.decodeWav(wav)
    dec.nSamples shouldBe n
    dec.sampleRateHz shouldBe AudioCodec.SampleRateHz
    val samples = (0 until n).map(AudioCodec.sample(id, _).toLong)
    dec.sum shouldBe samples.sum
    dec.absSum shouldBe samples.map(math.abs).sum
    dec.peak shouldBe samples.map(math.abs).max.toInt
  }

  test("real PNG codec round-trips every pixel exactly") {
    import Multimodal.ImageCodec
    val (id, w, h) = (42L, 23, 19)
    val dec = ImageCodec.decode(ImageCodec.encodePng(id, w, h))
    dec.width shouldBe w
    dec.height shouldBe h
    val expR = (for (y <- 0 until h; x <- 0 until w) yield ImageCodec.r(id, x, y).toLong).sum
    val expG = (for (y <- 0 until h; x <- 0 until w) yield ImageCodec.g(id, x, y).toLong).sum
    val expB = (for (y <- 0 until h; x <- 0 until w) yield ImageCodec.b(id, x, y).toLong).sum
    (dec.sumR, dec.sumG, dec.sumB) shouldBe ((expR, expG, expB))
  }

  test("real codec resize produces the requested model-input dims") {
    import Multimodal.ImageCodec
    val img = ImageCodec.resize(ImageCodec.encodePng(7L, 23, 19), 224, 224)
    (img.getWidth, img.getHeight) shouldBe ((224, 224))
  }

  test("real animated-GIF video codec round-trips every frame pixel exactly") {
    import Multimodal.VideoCodec
    val (id, w, h, nf) = (17L, 11, 9, 5)
    val bytes = VideoCodec.encodeGif(id, w, h, nf)
    VideoCodec.frameCount(bytes) shouldBe nf
    // stride 1 = full decode: every frame, every pixel, bit-exact
    val full = VideoCodec.sampleFrames(bytes, stride = 1)
    full.map(_.frameIdx) shouldBe (0 until nf)
    full.foreach { fr =>
      (fr.width, fr.height) shouldBe ((w, h))
      val exp = (for (y <- 0 until h; x <- 0 until w)
        yield VideoCodec.gray(id, fr.frameIdx, x, y).toLong).sum
      fr.graySum shouldBe exp
    }
    // stride 2 = frame sampling keeps exactly frames 0, 2, 4
    VideoCodec.sampleFrames(bytes, stride = 2).map(_.frameIdx) shouldBe Seq(0, 2, 4)
  }

  test("byteBalanced bounds partition bytes near the mean on a skewed corpus") {
    import org.apache.spark.sql.functions._
    // Adversarial fixture: heavy blobs CLUSTERED in id order (ids 0-49 are
    // 100x the rest) — scan-order chunking would hand one task all of
    // them. maxRow (5000) < per-partition mean, so a ~2x bound is
    // attainable; an indivisible mega-blob is the documented exception.
    val nParts = 8
    val rows = (0 until 50).map(i => (i.toLong, 5000L)) ++
      (50 until 2050).map(i => (i.toLong, 50L))
    val df = rows.toDF("media_id", "w")
    val out = Multimodal.byteBalanced(df, col("media_id"), col("w"), nParts)
    out.rdd.getNumPartitions shouldBe nParts
    // same multiset of rows back (repartition only moves, never rewrites)
    out.groupBy().agg(sum("w"), count(lit(1))).head() shouldBe
      df.groupBy().agg(sum("w"), count(lit(1))).head()
    val perPart = out
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("w").as("bytes"))
      .collect().map(_.getLong(1))
    val mean = rows.map(_._2).sum.toDouble / nParts
    withClue(s"partition byte loads ${perPart.toSeq.sorted.reverse}, mean $mean:\n") {
      perPart.max.toDouble should be <= 2.0 * mean
    }
  }

  test("media table derives deterministically from documents") {
    val m = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    m.count() shouldBe 500
    val row = m.filter(_.media_id == 0L).head()
    row.format shouldBe "png"
    val docText = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("doc_id = 0").head().getAs[String]("text")
    new String(row.media, "UTF-8") shouldBe docText
  }
}
