package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata structs.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic fake (dimensions derived from payload bytes) — but the
  * Spark-side plumbing is real: binary columns, struct metadata, a
  * frame-sampling generator, and partition-parallel batch processing.
  * The real-codec path would swap `fakeDecode` for a `mapPartitions`
  * call into a native decoder (see graft.stream.MediaPipeline for the
  * typed Dataset variant + tests).
  */
object Multimodal {

  /** qm1: binary payload + derived metadata + md5 content address. */
  def qm1_multimodal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      // deterministic fake decode: "image" dims from payload size
      .withColumn("width", (pmod(col("n_bytes"), lit(64)) * 16 + 16).cast("long"))
      .withColumn("height", (pmod(col("n_bytes"), lit(48)) * 16 + 16).cast("long"))
      .withColumn("n_frames", (pmod(col("n_bytes"), lit(7)) + 1).cast("long"))
      .select(col("doc_id"), col("n_bytes"), col("content_md5"),
        col("width"), col("height"), col("n_frames"))
      .orderBy("doc_id")

  /** qm2: frame sampling — explode every k-th frame offset from the
    * fake-decoded frame count (generator over media metadata). */
  def qm2_frame_sample(s: SparkSession, d: String): DataFrame =
    qm1_multimodal(s, d)
      .withColumn("frame", explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))))
      .select(col("doc_id"), col("frame"),
        (col("frame") * col("width") * col("height")).as("byte_offset"))
      .orderBy("doc_id", "frame")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm1_multimodal" -> (qm1_multimodal _),
    "qm2_frame_sample" -> (qm2_frame_sample _))

  val oracle: Map[String, String] = Map(
    "qm1_multimodal" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_md5,
        | CAST(octet_length(CAST(text AS BLOB)) % 64 * 16 + 16 AS BIGINT) AS width,
        | CAST(octet_length(CAST(text AS BLOB)) % 48 * 16 + 16 AS BIGINT) AS height,
        | CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "qm2_frame_sample" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) % 64 * 16 + 16 AS BIGINT) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 48 * 16 + 16 AS BIGINT) AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
        | FROM documents)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame,
        | CAST(f * width * height AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, width, height, unnest(range(0, n_frames, 2)) AS f FROM m)
        |ORDER BY doc_id, frame""".stripMargin)
}
