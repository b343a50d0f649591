package graft

import java.nio.file.Files

import graft.stream.MultimodalIngest

/** The composed ingest membrane: text (exact + LSH near-dup) AND
  * embedding (cosine-at-tau) rejection in one foreachBatch, sharing one
  * epoch id and one compaction cadence. */
class MultimodalIngestSpec extends SparkSpec {
  import spark.implicits._

  // text fixtures (IngestDedupSpec's trick): a 30-token prefix fills the
  // 120-char shingle window, so sharing it means identical band keys
  private def uniq(tag: String) = (0 until 30).map(i => f"$tag%s$i%02d").mkString(" ")
  private val base = uniq("w") + " tail one"
  private val exactDup = uniq("w") + " tail one"
  private val nearDup = uniq("w") + " tail two differs"

  private def freshDir(): String = {
    val dir = Files.createTempDirectory("graft_mm").toString + "/pipe"
    MultimodalIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    dir
  }

  private def corpusIds(dir: String) = MultimodalIngest.corpus(spark, dir)
    .select("doc_id").as[Long].collect().sorted.toSeq
  private def cellIds(dir: String) = spark.read.parquet(s"$dir/embed/cells")
    .select("vec_id").as[Long].collect().sorted.toSeq

  test("both reject paths fire in one epoch; text and vector stores stay consistent") {
    val dir = freshDir()
    MultimodalIngest.ingestBatch(Seq(
      (1L, base, Seq(1f, 0f)),
      (2L, exactDup, Seq(0f, 1f)),        // text EXACT dup of 1 (novel embedding!)
      (3L, nearDup, Seq(0.3f, 0.95f)),    // text NEAR dup of 1
      (4L, uniq("x"), Seq(0.999f, 0.01f)), // novel text, embedding ~ doc 1: cos≈0.99995
      (5L, uniq("y"), Seq(0f, 1f))        // admitted
    ).toDF("doc_id", "text", "embedding"), dir, epochId = 0, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 5L),
      "2,3 lose to the text membrane; 4 loses to the embedding membrane")
    assert(cellIds(dir) == Seq(1L, 5L),
      "the vector store must hold exactly the admitted docs")

    // batch 2: same rejections, now against the accumulated corpus
    MultimodalIngest.ingestBatch(Seq(
      (6L, base, Seq(0.5f, 0.5f)),         // text exact dup vs corpus
      (7L, uniq("z"), Seq(0.999f, 0.02f)), // embedding near-dup vs corpus doc 1
      (8L, uniq("q"), Seq(-1f, 0f))        // admitted
    ).toDF("doc_id", "text", "embedding"), dir, epochId = 1, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 5L, 8L))
    assert(cellIds(dir) == Seq(1L, 5L, 8L))

    // both stores carry the SAME epoch partitions — the shared-id contract
    Seq(s"$dir/text/corpus", s"$dir/text/exact_idx", s"$dir/text/band_idx",
        s"$dir/embed/cells").foreach { store =>
      val epochs = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
        .map(_.getName).sorted.toSeq
      assert(epochs == Seq("epoch=0", "epoch=1"), s"$store has $epochs")
    }

    // the rejection ledger attributes each loss to its membrane
    val m = MultimodalIngest.metrics(spark, dir)
      .select("batch_id", "n_in", "n_text_rejected", "n_embed_rejected", "n_admitted")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m == Seq((0L, 5L, 2L, 1L, 2L), (1L, 3L, 1L, 1L, 1L)), s"ledger: $m")
  }

  test("three membranes, one epoch: media rejects between text and embedding") {
    val dir = freshDir()
    val basePayload = "ab" * 160 // phash 0 (see MediaPipelineSpec)
    def payloadBits(bits: Int*) = {
      val sb = new StringBuilder(basePayload)
      bits.foreach(b => (0 until 10).foreach(i => sb.setCharAt(b * 10 + i, 'z')))
      sb.toString
    }
    MultimodalIngest.ingestBatch(Seq(
      (1L, base, basePayload, Seq(1f, 0f)),
      (2L, exactDup, payloadBits(8, 9, 10, 11), Seq(0f, 1f)), // text dup (media novel!)
      (3L, uniq("x"), payloadBits(5), Seq(0f, 1f)),  // MEDIA near-dup of 1 (dist 1)
      (4L, uniq("y"), payloadBits(12, 13, 14, 15), Seq(0.999f, 0.01f)), // embed dup of 1
      (5L, uniq("q"), payloadBits(16, 17, 18, 19), Seq(0f, 1f)) // admitted
    ).toDF("doc_id", "text", "media", "embedding"), dir, epochId = 0, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 5L),
      "2 text, 3 media, 4 embedding — each membrane rejects its own case")

    // batch 2: the media index accumulated — corpus-side perceptual hit
    MultimodalIngest.ingestBatch(Seq(
      (6L, uniq("r"), payloadBits(17, 18, 19), Seq(0f, -1f)), // dist 1 from doc 5's media
      (7L, uniq("s"), payloadBits(24, 25, 26, 27), Seq(-1f, 0f)) // admitted
    ).toDF("doc_id", "text", "media", "embedding"), dir, epochId = 1, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 5L, 7L),
      "6 is a perceptual near-dup of admitted doc 5's payload")

    // the per-batch ledger attributes the media stage separately
    val m = MultimodalIngest.metrics(spark, dir)
      .select("batch_id", "n_in", "n_text_rejected", "n_media_rejected",
        "n_embed_rejected", "n_admitted")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(m == Seq((0L, 5L, 1L, 1L, 1L, 2L), (1L, 2L, 0L, 1L, 0L, 1L)), s"ledger: $m")

    // media index carries only fully-admitted docs, same epoch labels
    val idxIds = spark.read.parquet(s"$dir/media/media_idx")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(idxIds == Seq(1L, 5L, 7L), s"media_idx owners: $idxIds")
  }

  test("replaying an epoch is idempotent across BOTH stores") {
    val dir = freshDir()
    val b0 = Seq((1L, base, Seq(1f, 0f)), (2L, uniq("y"), Seq(0f, 1f)))
      .toDF("doc_id", "text", "embedding")
    val b1 = Seq((3L, uniq("z"), Seq(0.7f, 0.714f)))
      .toDF("doc_id", "text", "embedding")
    MultimodalIngest.ingestBatch(b0, dir, epochId = 0, tau = 0.99)
    MultimodalIngest.ingestBatch(b1, dir, epochId = 1, tau = 0.99)
    MultimodalIngest.ingestBatch(b0, dir, epochId = 0, tau = 0.99)
    MultimodalIngest.ingestBatch(b1, dir, epochId = 1, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 2L, 3L))
    assert(cellIds(dir) == Seq(1L, 2L, 3L))
  }

  test("a crash BETWEEN the text and vector writes of one epoch converges on replay") {
    val dir = freshDir()
    MultimodalIngest.ingestBatch(
      Seq((1L, base, Seq(1f, 0f))).toDF("doc_id", "text", "embedding"),
      dir, epochId = 0, tau = 0.99)
    MultimodalIngest.ingestBatch(
      Seq((2L, uniq("y"), Seq(0f, 1f))).toDF("doc_id", "text", "embedding"),
      dir, epochId = 1, tau = 0.99)
    // simulate the crash window: epoch 1 committed in the text stores
    // but never reached the vector store
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/embed/cells/epoch=1"), true))
    assert(cellIds(dir) == Seq(1L))
    // streaming replays the whole epoch; OVERWRITE in every store converges
    MultimodalIngest.ingestBatch(
      Seq((2L, uniq("y"), Seq(0f, 1f))).toDF("doc_id", "text", "embedding"),
      dir, epochId = 1, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 2L) && cellIds(dir) == Seq(1L, 2L))
  }

  test("one compaction cadence folds every store; probes unchanged after the fold") {
    val dir = freshDir()
    val docs = Seq(
      (1L, base, Seq(1f, 0f)),
      (2L, uniq("y"), Seq(0f, 1f)),
      (3L, uniq("z"), Seq(0.7f, 0.714f)))
    docs.zipWithIndex.foreach { case (d, e) =>
      MultimodalIngest.ingestBatch(Seq(d).toDF("doc_id", "text", "embedding"),
        dir, epochId = e, tau = 0.99)
    }
    MultimodalIngest.compact(spark, dir, upTo = 3)
    Seq(s"$dir/text/corpus", s"$dir/text/exact_idx", s"$dir/text/band_idx",
        s"$dir/embed/cells").foreach { store =>
      val epochs = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("epoch=")).map(_.getName).toSeq
      assert(epochs == Seq("epoch=2"), s"$store folded to $epochs")
    }
    // post-fold: text dup of epoch-0 doc and embed dup of epoch-2 doc
    // still rejected; novelty still admitted — and the epoch replays
    MultimodalIngest.ingestBatch(Seq(
      (10L, base, Seq(-1f, 0f)),              // text dup of folded doc 1
      (11L, uniq("n"), Seq(0.7f, 0.715f)),    // embed dup of folded doc 3
      (12L, uniq("m"), Seq(-0.7f, -0.714f))   // novel
    ).toDF("doc_id", "text", "embedding"), dir, epochId = 3, tau = 0.99)
    assert(corpusIds(dir) == Seq(1L, 2L, 3L, 12L))
    assert(cellIds(dir) == Seq(1L, 2L, 3L, 12L))
  }

  test("combined cadence: compact + requantize in one batch folds text, re-cells embed") {
    val root = Files.createTempDirectory("graft_mm_rq").toString
    val dir = s"$root/pipe"
    MultimodalIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Seq[Float])]
    val docs = input.toDF().toDF("doc_id", "text", "embedding")
    def drain(): Unit = {
      val q = MultimodalIngest.start(docs, dir, s"$root/ckpt",
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        tau = 0.99, compactEvery = 1, requantizeEvery = 1)
      assert(q.awaitTermination(120000))
    }
    input.addData((1L, base, Seq(0.7f, 0.714f)), (2L, uniq("y"), Seq(0.7f, -0.714f)))
    drain() // batch 0: no maintenance
    input.addData((3L, exactDup, Seq(0f, 1f)),       // text dup vs corpus
      (4L, uniq("z"), Seq(0.7f, 0.715f)),            // embed dup of doc 1
      (5L, uniq("q"), Seq(-0.7f, 0.714f)))           // admitted
    drain() // batch 1: BOTH cadences fire before the batch
    assert(corpusIds(dir) == Seq(1L, 2L, 5L))
    assert(cellIds(dir) == Seq(1L, 2L, 5L))
    // embed store was re-quantized from the corpus (not the axis pins)
    assert(spark.read.parquet(s"$dir/embed/centroids")
      .select("cid").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // text stores folded to one committed epoch + the live batch 1
    Seq(s"$dir/text/exact_idx", s"$dir/text/band_idx").foreach { store =>
      val epochs = new java.io.File(store).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("epoch=")).map(_.getName).sorted
      assert(epochs.toSeq == Seq("epoch=0", "epoch=1"), s"$store: ${epochs.toSeq}")
    }
  }

  test("streaming entry: two micro-batches through start() share the batch id") {
    val root = Files.createTempDirectory("graft_mm_s").toString
    val dir = s"$root/pipe"
    MultimodalIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Seq[Float])]
    val docs = input.toDF().toDF("doc_id", "text", "embedding")
    input.addData((1L, base, Seq(1f, 0f)), (2L, exactDup, Seq(0f, 1f)),
      (3L, uniq("y"), Seq(0.999f, 0.01f)))
    val q = MultimodalIngest.start(docs, dir, s"$root/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), tau = 0.99)
    assert(q.awaitTermination(120000))
    assert(corpusIds(dir) == Seq(1L), "2 text-dups 1; 3 embed-dups 1")
    input.addData((4L, nearDup, Seq(0f, -1f)), (5L, uniq("z"), Seq(0f, 1f)))
    val q2 = MultimodalIngest.start(docs, dir, s"$root/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow(), tau = 0.99)
    assert(q2.awaitTermination(120000))
    assert(corpusIds(dir) == Seq(1L, 5L),
      "4 text-near-dups corpus doc 1 across batches; 5 is novel")
    assert(cellIds(dir) == Seq(1L, 5L))
  }
}
