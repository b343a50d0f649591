package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.stream.MediaIngest

/** The perceptual-hash ingest membrane: near-dup media rejected against
  * batch-mates and the accumulated corpus, exactly-once epochs,
  * constant-bounded index probes.
  */
class MediaIngestSpec extends SparkSpec {
  import spark.implicits._

  // uniform payload hashes to 0 (see MediaPipelineSpec); overwriting
  // block b with 'z' sets exactly bit b — a controlled Hamming dial
  private val base = "ab" * 160
  private def bitSet(bits: Int*) = {
    val sb = new StringBuilder(base)
    bits.foreach(b => (0 until 10).foreach(i => sb.setCharAt(b * 10 + i, 'z')))
    sb.toString
  }

  private def corpusIds(dir: String) =
    spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().sorted.toSeq

  test("in-batch: exact-hash flood collapses; near dups rejected; distant kept") {
    val dir = Files.createTempDirectory("graft_media").toString
    // 1 base; 2 exact copy; 3 at distance 1; 4 at distance 4 (admitted:
    // past the radius); 5 too short to hash (admitted unfiltered)
    val docs = Seq(
      (1L, base), (2L, base), (3L, bitSet(5)),
      (4L, bitSet(8, 9, 10, 11)), (5L, "tiny")).toDF("doc_id", "media")
    MediaIngest.ingestBatch(docs, dir, epochId = 0)
    assert(corpusIds(dir) == Seq(1L, 4L, 5L),
      "exact dup (2) and distance-1 (3) lose; distance-4 (4) and unhashable (5) pass")
  }

  test("vs corpus: admitted hashes reject later arrivals; replay idempotent") {
    val dir = Files.createTempDirectory("graft_media_c").toString
    MediaIngest.ingestBatch(Seq((1L, base)).toDF("doc_id", "media"), dir, 0)
    // 11 is distant from BOTH the corpus base (4 bits) and its
    // batch-mate 10 (5 bits) — a batch-mate lost to the corpus still
    // rejects its own in-batch neighbors (no resurrection)
    val b1 = Seq((10L, bitSet(3)), (11L, bitSet(10, 11, 12, 13))).toDF("doc_id", "media")
    MediaIngest.ingestBatch(b1, dir, 1)
    assert(corpusIds(dir) == Seq(1L, 11L),
      "10 is within radius 3 of the corpus base; 11 is at distance 4")
    // crash-replay of epoch 1 must not duplicate or flip decisions
    MediaIngest.ingestBatch(b1, dir, 1)
    assert(corpusIds(dir) == Seq(1L, 11L))
    // a replayed epoch probes only epochs < 1: doc 11's own keys (epoch
    // 1) were invisible during its replay — still admitted, not
    // self-rejected
  }

  test("compaction folds index epochs without changing decisions") {
    val dir = Files.createTempDirectory("graft_media_f").toString
    (0 until 4).foreach { e =>
      MediaIngest.ingestBatch(
        Seq((e * 10L, bitSet(e + 4, e + 12))).toDF("doc_id", "media"), dir, e)
    }
    MediaIngest.compact(spark, dir, upTo = 4)
    val epochs = new java.io.File(s"$dir/media_idx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch=")).map(_.getName)
    assert(epochs.toSeq == Seq("epoch=3"), s"folded to one partition: ${epochs.toSeq}")
    // post-fold probes still reject a near dup of an early epoch's doc
    MediaIngest.ingestBatch(
      Seq((100L, bitSet(4, 12)), (101L, bitSet(20, 21, 22, 23)))
        .toDF("doc_id", "media"), dir, 4)
    assert(corpusIds(dir) == Seq(0L, 10L, 20L, 30L, 101L),
      "100 duplicates epoch-0's doc exactly (folded keys still reject); 101 is new")
  }
}
