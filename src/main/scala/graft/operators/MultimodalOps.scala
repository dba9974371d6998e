package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata. The container has no image/audio codecs, so decode is a
  * clearly-marked deterministic stub — the Spark-side contract (schema,
  * batch shape, partition-local decode, feature schema) is real and tested.
  *
  * Scale notes: decode runs in mapPartitions so any native library is
  * initialized once per partition, not per row; binaries never shuffle —
  * features are extracted before any wide operation.
  */
object MultimodalOps {

  /** A decoded media asset's typed metadata. */
  case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int, format: String)

  /** STUB decode: a real pipeline would decode image bytes here (JAI /
    * ffmpeg / jpeg lib); this deterministic fake derives metadata from the
    * byte content so tests are stable. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, (n % 640).toInt, (n % 480).toInt, if (id % 2 == 0) "png" else "jpeg")
  }

  /** Binary ingestion + partition-local decode via mapPartitions (the
    * Scala analog of mapInPandas batches). */
  def decodedMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    val spark0 = spark
    import spark0.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of a (stubbed) codec would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** STUB resize: a real pipeline would call the imaging library here;
    * the deterministic fake clamps to the target box preserving aspect
    * ratio (integer arithmetic, so tests are stable) and keeps the byte
    * length as the "re-encoded" size. */
  def resizeStub(m: MediaMeta, targetW: Int, targetH: Int): MediaMeta = {
    require(targetW > 0 && targetH > 0, "resize target must be positive")
    if (m.width <= 0 || m.height <= 0) m.copy(width = targetW, height = targetH)
    else {
      // scale = min(tw/w, th/h) in 1/1024 fixed point — aspect preserved
      val s = math.min(targetW * 1024L / m.width, targetH * 1024L / m.height)
      m.copy(width = math.max(1, (m.width * s / 1024).toInt),
        height = math.max(1, (m.height * s / 1024).toInt))
    }
  }

  /** Decode → resize as one partition-local batch stage (codec init once
    * per partition, binaries never shuffle). */
  def resizedMeta(spark: SparkSession, dir: String, targetW: Int, targetH: Int): Dataset[MediaMeta] = {
    val spark0 = spark
    import spark0.implicits._
    decodedMeta(spark, dir).mapPartitions { it =>
      // per-partition init of the (stubbed) resize codec would go here
      it.map(m => resizeStub(m, targetW, targetH))
    }
  }

  /** Frame sampling: k evenly-spaced fixed-width slices per asset — the
    * video frame-sample batch shape (one output row per frame, offset
    * carried as typed metadata). The slice positions are computed from the
    * byte length, the fan-out is a posexplode of a transform(sequence),
    * and nothing shuffles — at scale this is the narrow stage right after
    * decode, before any wide op sees the (much smaller) per-frame rows. */
  def frameSample(spark: SparkSession, dir: String, k: Int = 4, width: Int = 8): DataFrame = {
    require(k >= 2, s"frameSample needs k >= 2 frames (got $k): offsets span (n-width)/(k-1)")
    require(width >= 1, s"frameSample needs a positive slice width (got $width)")
    Tables(spark, dir, "documents")
      .withColumn("media", col("text").cast("binary"))
      .withColumn("n", length(col("media")).cast("long"))
      .filter(col("n") >= width)
      .select(col("doc_id"), col("media"), col("n"),
        posexplode(expr(s"transform(sequence(0, ${k - 1}), i -> CAST(i AS BIGINT) * (n - $width) DIV ${k - 1})")))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        col("col").as("offset"),
        expr(s"substring(hex(media), CAST(col * 2 + 1 AS INT), ${width * 2})")
          .as("frame_hex"))
      .orderBy("doc_id", "frame_idx")
  }

  /** [[decodedMeta]] as an oracle-checkable frame: the typed
    * mapPartitions decode path (per-partition codec init, case-class
    * Encoder) hash-compared against the stub's integer arithmetic
    * recomputed relationally — the decode PLUMBING is what's under test,
    * the codec is the declared stub. */
  def decodedMetaDF(spark: SparkSession, dir: String): DataFrame =
    decodedMeta(spark, dir).toDF()
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), col("format"))
      .orderBy("doc_id")

  /** [[resizedMeta]] as an oracle-checkable frame — the two-stage
    * decode→resize mapPartitions chain (both stages partition-local,
    * nothing shuffles) with the aspect-preserving fixed-point arithmetic
    * reproduced exactly by the oracle, degenerate (zero-dimension)
    * assets exercising the clamp branch. */
  def resizedMetaDF(spark: SparkSession, dir: String, targetW: Int = 256, targetH: Int = 256): DataFrame =
    resizedMeta(spark, dir, targetW, targetH).toDF()
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), col("format"))
      .orderBy("doc_id")

  /** Audio-style CHUNKING: fixed-width windows every `hop` bytes (width >
    * hop = overlapping windows, the spectrogram-frame shape) — one output
    * row per chunk with its byte offset as typed metadata. Like
    * [[frameSample]] the fan-out is a posexplode over a computed offset
    * sequence and nothing shuffles: at scale this is the narrow stage
    * right after ingest, emitting slim (doc, offset, chunk) rows before
    * any wide op. */
  def mediaChunks(spark: SparkSession, dir: String, width: Int = 16, hop: Int = 12): DataFrame = {
    require(width >= 1 && hop >= 1, s"mediaChunks needs positive width/hop (got $width/$hop)")
    Tables(spark, dir, "documents")
      .withColumn("media", col("text").cast("binary"))
      .withColumn("n", length(col("media")).cast("long"))
      .filter(col("n") >= width)
      .select(col("doc_id"), col("media"),
        posexplode(expr(
          s"transform(sequence(0, CAST((n - $width) DIV $hop AS INT)), i -> CAST(i AS BIGINT) * $hop)")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("offset"),
        expr(s"substring(hex(media), CAST(col * 2 + 1 AS INT), ${width * 2})")
          .as("chunk_hex"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Oracle-checkable feature extraction over the binary column: byte
    * length, content hash, leading-bytes sample ("frame sample" analog) —
    * pure column expressions so DuckDB can reproduce them. */
  def binaryFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("media", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        sha2(col("media"), 256).as("content_sha256"),
        substring(hex(col("media")), 1, 16).as("head_hex"),
        (length(col("media")) % 640).cast("int").as("fake_width"),
        (length(col("media")) % 480).cast("int").as("fake_height"))
      .orderBy("doc_id")
}
