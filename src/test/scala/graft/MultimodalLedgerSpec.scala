package graft

import java.nio.file.Files

import graft.stream.MultimodalIngest

/** The composed per-doc rejection ledger: every membrane (text, media,
  * embedding) attributes its rejections, and dup_of chains resolve
  * ACROSS membranes to the terminal ADMITTED doc — so the streamed
  * multimodal corpus answers qd6-shaped cluster queries that mix
  * rejection modalities, without a batch rebuild. */
class MultimodalLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(tag: String) = (0 until 30).map(i => f"$tag%s$i%02d").mkString(" ")

  // MediaPipelineSpec's payload scheme: 320 chars, block b (chars
  // b*10..b*10+9) flipped to 'z' sets phash bit b
  private val basePayload = "ab" * 160
  private def pb(bits: Int*) = {
    val sb = new StringBuilder(basePayload)
    bits.foreach(b => (0 until 10).foreach(i => sb.setCharAt(b * 10 + i, 'z')))
    sb.toString
  }

  private def freshDir(): String = {
    val dir = Files.createTempDirectory("graft_mml").toString + "/pipe"
    MultimodalIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    dir
  }

  private def ledgerRows(dir: String) =
    MultimodalIngest.ledger(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        r.getAs[String]("reason"))).toSet

  // epoch 0: two admitted docs with well-separated text, payloads and
  // embeddings — the corpus side of every membrane's probe
  private def seed(dir: String): Unit =
    MultimodalIngest.ingestBatch(Seq(
      (1L, uniq("w") + " tail one", basePayload, Seq(1f, 0f)),
      (2L, uniq("k") + " tail two", pb(8, 9, 10, 11), Seq(0f, 1f))
    ).toDF("doc_id", "text", "media", "embedding"), dir, epochId = 0, tau = 0.99)

  // epoch 1: one rejection per membrane plus one CHAIN per membrane —
  // a doc whose in-batch winner is itself rejected at a later stage
  private def batch1 = Seq(
    // embed_corpus: novel text/payload, embedding ≈ admitted doc 1
    (3L, uniq("a") + " t", pb(12, 13, 14, 15), Seq(0.999f, 0.01f)),
    // exact_batch → 3, but 3 loses the EMBED stage → terminal dup_of 1
    (4L, uniq("a") + " t", pb(16, 17, 18, 19), Seq(-1f, 0f)),
    // media_corpus: payload Hamming-1 from admitted doc 1's
    (5L, uniq("b") + " t", pb(5), Seq(0f, -1f)),
    // exact_batch → 5, but 5 loses the MEDIA stage → terminal dup_of 1
    (6L, uniq("c") + " t", uniq("b") + " t", Seq(0.5f, -0.5f)),
    // embed_batch → 3 (cos ≈ 1, smaller id) → terminal dup_of 1.
    // Payload is ≥ 4 bits from every other payload in play so the
    // media stage passes it through to the embedding stage.
    (7L, uniq("d") + " t", pb(1, 2, 3, 6), Seq(0.999f, 0.02f)),
    // media_batch → 7 (Hamming 1), but 7 loses EMBED → terminal dup_of 1
    (8L, uniq("e") + " t", pb(1, 2, 3, 6, 7), Seq(0.6f, -0.6f))
  )

  test("every membrane attributes; chains resolve across membranes to admitted docs") {
    val dir = freshDir()
    seed(dir)
    // doc 6's TEXT duplicates doc 5's (its media column carries 5's
    // text as payload so the media stage ignores it — unhashable-safe
    // length is fine either way, the text stage rejects 6 first)
    val b1 = batch1.map { case (id, t, m, e) =>
      if (id == 6L) (id, uniq("b") + " t", pb(24, 25, 26, 27), e) else (id, t, m, e)
    }
    MultimodalIngest.ingestBatch(
      b1.toDF("doc_id", "text", "media", "embedding"), dir, epochId = 1, tau = 0.99)

    assert(MultimodalIngest.corpus(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "all six epoch-1 docs must be rejected by some membrane")

    assert(ledgerRows(dir) == Set(
      (3L, Some(1L), "embed_corpus"),
      (4L, Some(1L), "exact_batch"),   // 4 → 3 → 1
      (5L, Some(1L), "media_corpus"),
      (6L, Some(1L), "exact_batch"),   // 6 → 5 → 1
      (7L, Some(1L), "embed_batch"),   // 7 → 3 → 1
      (8L, Some(1L), "media_batch")),  // 8 → 7 → 3 → 1
      s"got: ${ledgerRows(dir)}")

    // every dup_of names an ADMITTED doc — the chain-resolution contract
    val admitted = MultimodalIngest.corpus(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(ledgerRows(dir).forall(r => admitted.contains(r._2.get)))

    // clusters mix modalities: one cluster holds text, media AND
    // embedding dups of the same admitted doc
    val cl = MultimodalIngest.clusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_canonical"), r.getAs[Long]("cluster_size"))).toSet
    assert(cl == Set(
      (1L, 1L, true, 7L), (3L, 1L, false, 7L), (4L, 1L, false, 7L),
      (5L, 1L, false, 7L), (6L, 1L, false, 7L), (7L, 1L, false, 7L),
      (8L, 1L, false, 7L), (2L, 2L, true, 1L)), s"clusters: $cl")
  }

  test("replayed epoch rewrites the identical composed ledger (exactly-once)") {
    val dir = freshDir()
    seed(dir)
    val b1 = batch1.map { case (id, t, m, e) =>
      if (id == 6L) (id, uniq("b") + " t", pb(24, 25, 26, 27), e) else (id, t, m, e)
    }.toDF("doc_id", "text", "media", "embedding")
    MultimodalIngest.ingestBatch(b1, dir, epochId = 1, tau = 0.99)
    val before = ledgerRows(dir)
    MultimodalIngest.ingestBatch(b1, dir, epochId = 1, tau = 0.99)
    assert(ledgerRows(dir) == before, "replay must overwrite, not append")
    // folding the ledger on the compact cadence changes nothing
    MultimodalIngest.compact(spark, dir, upTo = 2)
    assert(ledgerRows(dir) == before)
  }

  test("media-less pipeline still ledgers text + embed stages") {
    val dir = freshDir()
    MultimodalIngest.ingestBatch(Seq(
      (1L, uniq("w") + " tail", Seq(1f, 0f)),
      (2L, uniq("w") + " tail", Seq(0f, 1f)),      // exact_batch → 1
      (3L, uniq("x") + " t", Seq(0.999f, 0.01f))   // embed_batch → 1
    ).toDF("doc_id", "text", "embedding"), dir, epochId = 0, tau = 0.99)
    assert(ledgerRows(dir) == Set(
      (2L, Some(1L), "exact_batch"), (3L, Some(1L), "embed_batch")),
      s"got: ${ledgerRows(dir)}")
  }
}
