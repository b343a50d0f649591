package graft.batch

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{MediaBlob, MediaMeta}

/** Typed multimodal processing path: `Dataset[MediaBlob]` →
  * partition-parallel decode → `Dataset[MediaMeta]`.
  *
  * This is the Scala analog of a Pandas-UDF/`mapInPandas` batch decode:
  * `mapPartitions` hands each executor an iterator of payloads so a
  * native decoder can amortize per-batch setup (codec init, GPU
  * context). The container has no codecs, so [[fakeDecode]] derives
  * deterministic "dimensions" from the payload bytes — the plumbing
  * (binary columns, typed output schema, partition batching) is the
  * real, tested part; swap [[fakeDecode]] for the codec call in
  * production.
  */
object MediaPipeline {

  /** Deterministic stand-in for an image/audio decoder. */
  def fakeDecode(b: MediaBlob): MediaMeta = {
    val md5 = MessageDigest.getInstance("MD5").digest(b.payload)
      .map("%02x".format(_)).mkString
    val n = b.payload.length.toLong
    MediaMeta(b.mediaId, b.kind, n, md5,
      width = (n % 64).toInt * 16 + 16,
      height = (n % 48).toInt * 16 + 16,
      nFrames = (n % 7).toInt + 1)
  }

  /** Decode a blob dataset partition-parallel (one decoder per
    * partition, batch-amortized). */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder setup would go here (codec/GPU init)
      it.map(fakeDecode)
    }
  }

  /** Frame sampling: every `step`-th frame index per decoded media. */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): Dataset[(Long, Int)] = {
    import meta.sparkSession.implicits._
    meta.flatMap(m => (0 until m.nFrames by step).map(f => (m.mediaId, f)))
  }
}
