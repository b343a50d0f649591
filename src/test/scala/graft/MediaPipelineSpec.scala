package graft

import graft.batch.MediaPipeline
import graft.model.MediaBlob

/** Multimodal plumbing: partition-parallel decode + frame sampling. */
class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decode runs partition-parallel and is deterministic") {
    val blobs = (0L until 20L).map(i =>
      MediaBlob(i, "image", Array.fill((i % 5).toInt + 1)(i.toByte)))
    val meta = MediaPipeline.decode(spark.createDataset(blobs).repartition(4))
      .collect().sortBy(_.mediaId)
    assert(meta.length == 20)
    assert(meta.forall(m => m.nBytes == (m.mediaId % 5) + 1))
    assert(meta.forall(m => m.width == (m.nBytes % 64) * 16 + 16))
    // content-addressing: identical payloads hash identically
    val m0 = MediaPipeline.fakeDecode(MediaBlob(99, "image", Array[Byte](1, 2)))
    val m1 = MediaPipeline.fakeDecode(MediaBlob(98, "image", Array[Byte](1, 2)))
    assert(m0.contentMd5 == m1.contentMd5)
  }

  test("frame sampling takes every k-th frame") {
    val blobs = Seq(MediaBlob(1, "video", Array.fill(6)(1.toByte))) // nFrames = 6%7+1 = 7
    val meta = MediaPipeline.decode(spark.createDataset(blobs))
    val frames = MediaPipeline.sampleFrames(meta, 2).collect().sortBy(_._2)
    assert(frames.map(_._2).toSeq == Seq(0, 2, 4, 6))
  }
}
