package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads as opaque `binary` columns
 * with a typed metadata struct, plus batch feature extraction.
 *
 * The container has no image/audio codecs, so the actual decode is a
 * clearly-marked stub (`decodeStub`) producing deterministic fake
 * features from the bytes; everything Spark-side — schema, batch shape,
 * partition-local decoding, feature columns — is real and tested. On a
 * cluster with codecs, only `decodeStub`'s body changes (e.g. javax
 * ImageIO / ffmpeg via a mapPartitions worker pool); the plan stays
 * identical.
 *
 * Scale notes: decode runs inside `mapPartitions` so codec state is
 * initialized once per partition (not per row); payloads stay columnar
 * until the decode boundary; the output is a narrow feature frame that
 * downstream joins/aggregations shuffle instead of the blobs.
 */
object Multimodal {

  /** A media row: payload + typed metadata (the multimodal column model). */
  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      mime: String,
      meta_source: String)

  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      mime: String,
      width: Int,
      height: Int,
      channels: Int,
      checksum: Long)

  /**
   * STUB — deterministic fake decode. A real deployment replaces this
   * body with an actual codec call (ImageIO.read / libsndfile / ffmpeg
   * frame sampling); the signature and the surrounding plan are final.
   * The fake derives stable pseudo-dimensions from the payload bytes so
   * tests and oracles are reproducible.
   */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = 64 + (n % 64)
    val height = 64 + (n % 48)
    (width, height, 3)
  }

  /** Documents → media table: text bytes standing in for image payloads
   * (binary column + metadata struct), exercising the real schema path. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("mime"),
        col("source").as("meta_source"))
      .as[MediaRow]
  }

  /** Batch feature extraction through the decode boundary:
   * mapPartitions so a real decoder initializes once per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real codecs would be initialized HERE, once per partition)
      it.map { row =>
        val (w, h, c) = decodeStub(row.media)
        var checksum = 0L
        var i = 0
        while (i < row.media.length) {
          checksum = (checksum * 131 + (row.media(i) & 0xff)) & 0xFFFFFFFFL
          i += 1
        }
        MediaFeatures(row.doc_id, row.media.length.toLong, row.mime, w, h, c, checksum)
      }
    }
  }

  /** Oracle-checkable slice of the pipeline (byte lengths + fake dims
   * are pure arithmetic on octet counts, reproducible in SQL). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("n_bytes"), col("mime"),
        col("width").cast("bigint").as("width"),
        col("height").cast("bigint").as("height"))

  /**
   * STUB resize — a real deployment swaps the body for an actual
   * rescale (e.g. Graphics2D / libswscale); the plumbing is final: the
   * payload is regenerated at the target dimensions inside the same
   * per-partition decode boundary, deterministically derived from the
   * source bytes so tests reproduce.
   */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte]((w * h * 3).toInt)
    var i = 0
    while (i < out.length) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
      i += 1
    }
    out
  }

  /** Resize every media payload to (w, h); output stays a media table so
   * resize composes with any downstream media op. */
  def resizeTo(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => r.copy(media = resizeStub(r.media, w, h)))
    }
  }

  final case class Frame(
      doc_id: Long,
      frame_idx: Long,
      n_bytes: Long,
      checksum: Long)

  /**
   * Frame sampling: the payload viewed as consecutive fixed-size frames
   * (a stand-in for video GOP structure); emit every `everyN`-th complete
   * frame as its own row — the one-row→many-rows media shape (flatMap,
   * no driver involvement, output proportional to sampled frames only).
   */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = r.media.length / frameBytes
      (0 until nFrames).iterator
        .filter(_ % everyN == 0)
        .map { k =>
          var checksum = 0L
          var i = k * frameBytes
          val end = i + frameBytes
          while (i < end) {
            checksum = (checksum * 131 + (r.media(i) & 0xff)) & 0xFFFFFFFFL
            i += 1
          }
          Frame(r.doc_id, k.toLong, frameBytes.toLong, checksum)
        }
    }
  }

  val FrameBytes = 64
  val SampleEvery = 3

  /** Oracle-checkable frame-sampling slice: frame indices and sizes are
   * octet arithmetic, reproducible in SQL. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), FrameBytes, SampleEvery).toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_bytes"))

  /** Oracle-checkable resize slice: every payload lands at w*h*3 bytes. */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(resizeTo(mediaTable(spark, dir), 32, 16)).toDF()
      .select(col("doc_id"), col("n_bytes"),
        col("width").cast("bigint").as("width"),
        col("height").cast("bigint").as("height"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures,
    "mm_frame_sample" -> mmFrameSample,
    "mm_resize" -> mmResize)

  val oracleSql: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           CAST(64 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
           CAST(64 + octet_length(encode(text)) % 48 AS BIGINT) AS height
         FROM documents""",
    "mm_frame_sample" ->
      """SELECT doc_id, frame_idx, CAST(64 AS BIGINT) AS n_bytes FROM (
           SELECT doc_id,
             unnest(range(0, octet_length(encode(text)) // 64)) AS frame_idx
           FROM documents)
         WHERE frame_idx % 3 = 0""",
    "mm_resize" ->
      """SELECT doc_id, CAST(32*16*3 AS BIGINT) AS n_bytes,
           CAST(64 + (32*16*3) % 64 AS BIGINT) AS width,
           CAST(64 + (32*16*3) % 48 AS BIGINT) AS height
         FROM documents""")
}
