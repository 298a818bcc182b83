package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are parquet; scans go through the vectorized parquet reader so
  * Catalyst pushes filters (`PushedFilters`) and prunes columns
  * (`ReadSchema`) into the scan — verified via `.explain("formatted")` in
  * PlanSpec. At 100 TB these would be partitioned/bucketed tables behind the
  * same accessors; nothing in the query layer assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * (region/nation are fixed-cardinality; supplier/part grow slowly). */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever encoding the generator last used, so we
    * normalize every historical variant to session-zone TIMESTAMP:
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses it as a timestamp; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it reads as
    *    nanos-since-epoch LONG. Convert to micros with integer division
    *    (truncation — exactly how DuckDB narrows ns→us).
    *  - parquet timestamp[us] without tz: reads as TIMESTAMP_NTZ, which
    *    `unix_micros` and `withWatermark` reject. The session tz is pinned
    *    UTC, so a plain cast to TIMESTAMP reinterprets the micros losslessly
    *    and keeps the DuckDB oracle's naive timestamps hash-identical.
    *  - plain TIMESTAMP: passthrough. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.withColumn("ts", tsAsTimestamp(df.schema("ts").dataType))
  }

  /** Column expression rendering a raw `ts` column (any of the historical
    * encodings [[events]] documents) as session-zone TIMESTAMP. Exposed for
    * call sites that must read `events.parquet` directly — the streaming
    * file-source gates — so their normalization can't drift from the batch
    * loader's. */
  def tsAsTimestamp(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case LongType         => timestamp_micros(expr("ts div 1000")) // nanos → micros
      case TimestampNTZType => col("ts").cast(TimestampType) // UTC session tz: lossless
      case _                => col("ts")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact row count read from parquet FOOTERS only — no Spark job, no data
    * pages touched (each footer carries per-row-group counts). Used for
    * cheap cardinality gates (q112's sketch threshold) where launching a
    * scan job per plan build would be a fixed per-query cost (ADVICE r10 #2,
    * VERDICT r10 next #5). Cached per (path, size, mtime): the test tables
    * are immutable and the scale replicas are write-once behind a `_READY`
    * stamp, so a hit never goes stale in practice; a rewritten path changes
    * size/mtime and misses. Keyed by PATH with the file-list fingerprint
    * stored alongside the count — a rewritten directory REPLACES its entry
    * instead of accreting one never-evicted entry (and one large file-list
    * key string) per rewrite, so the map is bounded by the number of
    * distinct scanned paths, not the number of rewrites (ADVICE r11). */
  private val footerCounts =
    new scala.collection.concurrent.TrieMap[String, (String, Long)]
  def parquetRowCount(s: SparkSession, path: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    def dataFiles(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isFile) {
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) Seq(st) else Nil
      } else fs.listStatus(st.getPath).toSeq.flatMap(dataFiles)
    val files = dataFiles(fs.getFileStatus(p))
    val digest = java.security.MessageDigest.getInstance("MD5")
    files.map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
      .sorted.foreach(l => digest.update(l.getBytes("UTF-8")))
    val fingerprint = digest.digest().map(b => f"${b & 0xff}%02x").mkString
    // double-checked under the map lock so concurrent first calls for the
    // same path compute the footer sum ONCE (ADVICE r12 — the bare
    // get/compute/put raced benignly but re-read every footer per caller);
    // holding the lock across the footer reads is fine, they are
    // metadata-only and first-scan contention is rare
    def hit: Option[Long] =
      footerCounts.get(path).collect { case (fp, n) if fp == fingerprint => n }
    hit.getOrElse(footerCounts.synchronized {
      hit.getOrElse {
        val n = files.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
          try r.getRecordCount finally r.close()
        }.sum
        footerCounts.put(path, (fingerprint, n))
        n
      }
    })
  }
}
