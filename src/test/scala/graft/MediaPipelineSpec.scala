package graft

import org.apache.spark.sql.functions._

import graft.batch.{MediaPipeline, Multimodal}
import graft.model.MediaBlob

/** Multimodal plumbing: partition-parallel decode + frame sampling +
  * perceptual near-dup over the stub-decoded payload. */
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

  test("phash: identical payloads collide; one-block edit flips one bit") {
    // A: 'ab' × 160 → every block averages 97, whole-payload mean 97,
    // strict > threshold → phash 0. B: block 5 overwritten with 'z'
    // (122) lifts that block's average far above the new global mean
    // (98) while every other block stays below → exactly bit 5 set.
    val a = "ab" * 160
    val b = a.substring(0, 50) + "z" * 10 + a.substring(60)
    val docs = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
    val ph = Multimodal.phash32(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    assert(ph(0L) == 0L && ph(1L) == 0L, "uniform payload → all bits clear")
    assert(ph(2L) == 32L, "the edited block must set exactly bit 5")

    val pairs = Multimodal.phashPairs(Multimodal.phash32(docs), cap = 128)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    // exact dup at distance 0, perturbed doc at distance 1 from both
    assert(pairs.toSet == Set((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  test("phash flood: capped band buckets emit O(cap²) pairs, not O(m²)") {
    // 300 identical payloads → one bucket per band of m=300; uncapped
    // the self-pairs would number C(300,2) = 44,850
    val docs = (0L until 300L).map(i => (i, "xy" * 100)).toDF("doc_id", "text")
    val out = Multimodal.phashPairs(Multimodal.phash32(docs), cap = 8).collect()
    assert(out.length == 28, s"C(8,2)=28 capped pairs expected, got ${out.length}")
    assert(out.forall(_.getAs[Long]("hamming") == 0L))
    // the cap prefix is CONTENT-HASH ordered (unbiased eviction under
    // flood — an id-ordered prefix would always evict the newest docs,
    // the IvfScaleBench planted-audit finding), so the surviving 8 are
    // the smallest md5(id), not the smallest ids
    val expected = (0L until 300L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i))
      .take(8).toSet
    val members = out.flatMap(r =>
      Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(members == expected,
      s"pairs must come from the md5-ordered bucket prefix: $members vs $expected")
  }

  test("phash banding finds EVERY pair within Hamming radius 3 (fixture)") {
    // pigeonhole guarantee: 4 bands, ≤ 3 differing bits → at least one
    // band agrees exactly, so banded candidates ≡ brute force at the
    // fixture scale where the member cap is non-binding
    val ph = Multimodal.phash32(
      Tables.spread(Tables.documents(spark, "/root/testdata/sf0.001")))
    val hashes = ph.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phash")))
    val brute = (for {
      (ida, pa) <- hashes; (idb, pb) <- hashes if ida < idb
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 3
    } yield (ida, idb, h.toLong)).toSet
    val banded = Multimodal.phashPairs(ph, cap = 128).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size} must be identical sets")
  }

  test("qm4: byte-identical videos surface with min_hamming 0 on every shared frame") {
    import spark.implicits._
    // video text of length 67 → n_frames = 67 % 7 + 1 = 5, sampled
    // frames 0, 2, 4 at offsets 0, 16, 32 — all three fit (4·8+32=64
    // ≤ 67). Two byte-identical videos must match on ALL 3 sampled
    // frames at distance 0; the unrelated third video must not pair
    // with them at distance ≤ 3 on any frame (different byte content)
    // seeded-random contents: aperiodic, so frames at DIFFERENT
    // offsets hash far apart (a periodic or ascending fill would make
    // every frame collide with every other and inflate the count)
    val rnd = new scala.util.Random(42)
    def randText(n: Int) = Seq.fill(n)((33 + rnd.nextInt(94)).toChar).mkString
    val base = randText(67) // n_frames = 67 % 7 + 1 = 5 → frames 0, 2, 4
    val other = randText(67)
    val docs = Seq((10L, base), (20L, base), (30L, other)).toDF("doc_id", "text")
    val out = Multimodal.videoFrameDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val (nPairs, minH) = out.getOrElse((10L, 20L),
      fail("byte-identical videos missing from the frame-dedup output"))
    assert(minH == 0L, s"min_hamming $minH, expected 0")
    assert(nPairs == 3L, s"matched $nPairs frame pairs, expected the 3 sampled frames")
  }
}
