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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> mmFeatures)

  val oracleSql: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           CAST(64 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
           CAST(64 + octet_length(encode(text)) % 48 AS BIGINT) AS height
         FROM documents""")
}
