package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{QueryDef, Tables}

/** Multimodal columns: media as opaque `binary` + typed metadata struct.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic fake ([[FakeCodec]]); everything Spark-side
  * — schema, batch iteration shape, partition-parallel decode, feature
  * schema — is real and spec-tested (MultimodalSpec). On a real cluster the
  * fake kernel is swapped for a JNI/codec call with the same signature;
  * nothing else changes.
  *
  * Scale: decode runs via `mapPartitions` (one codec context per
  * partition, streaming iterator — never materializes a partition), the
  * analog of Python's `mapInPandas` batches. Feature extraction after
  * decode is ordinary columnar work.
  */
object Multimodal {

  /** Media row: id + raw bytes + typed metadata (the "image table" shape). */
  final case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                            width: Int, height: Int)

  /** Decoded features: fixed-size embedding + dims actually decoded. */
  final case class MediaFeatures(media_id: Long, out_width: Int, out_height: Int,
                                 n_bytes: Int, features: Array[Float])

  /** STUB codec — deterministic fake standing in for a real image decoder.
    * Derives a 16-dim "feature vector" from a byte histogram so tests have
    * stable expected values. A real deployment replaces ONLY this object. */
  object FakeCodec {
    val FeatureDim = 16

    /** "Decode + resize" to (w, h); features = normalized 16-bin byte
      * histogram. Deterministic in the input bytes. */
    def decode(row: MediaRow, outW: Int, outH: Int): MediaFeatures = {
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < row.media.length) {
        hist((row.media(i) & 0xff) / FeatureDim) += 1f
        i += 1
      }
      val n = math.max(row.media.length, 1)
      var j = 0
      while (j < FeatureDim) { hist(j) /= n.toFloat; j += 1 }
      MediaFeatures(row.media_id, outW, outH, row.media.length, hist)
    }

    /** "Frame sampling": pick every `stride`-th byte window as a frame
      * surrogate — the batch/stride plumbing of video frame extraction. */
    def sampleFrames(row: MediaRow, stride: Int, frameBytes: Int): Seq[Array[Byte]] =
      row.media.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, idx) if idx % stride == 0 => chunk }
        .toSeq
  }

  /** Partition-parallel decode: one kernel init per partition, streaming
    * iterator in and out (the mapInPandas batch shape, Scala-native). */
  def decodeAll(media: Dataset[MediaRow], outW: Int, outH: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec would init its context here, once per partition
      it.map(FakeCodec.decode(_, outW, outH))
    }
  }

  /** Build a media table from the documents corpus (bytes = utf-8 text —
    * stands in for image payloads; metadata derived deterministically). */
  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("media"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("format"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Gate query: the binary-column plumbing that IS cross-engine
    * expressible — encode to bytes, byte length, content digest, typed
    * metadata projection. */
  val q53 = QueryDef(
    "q53_multimodal_binary_meta",
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS digest,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(doc_id % 640 + 64 AS INT) AS width,
      |  CAST(doc_id % 480 + 48 AS INT) AS height
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        octet_length(encode(col("text"), "utf-8")).as("n_bytes"),
        md5(col("text")).as("digest"),
        when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("format"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"))
      .orderBy("media_id")
  }

  val all: Seq[QueryDef] = Seq(q53)
}
