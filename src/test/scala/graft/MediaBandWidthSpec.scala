package graft

import org.apache.spark.sql.functions._

import graft.batch.Multimodal

/** The band-width saturation trade ScaleBench's qm4 measurement
  * exposed, pinned at the [[Multimodal.phashPairs]] seam: 8-bit bands
  * give 4 × 256 = 1024 buckets TOTAL, so once the corpus passes
  * ~1024 × cap hashes the member-cap prefix binds on ordinary buckets
  * and planted near-dup pairs are silently dropped; widening to a
  * 64-bit hash with 16-bit bands (4 × 65536 buckets) removes the loss
  * at the SAME cap and corpus size. The radius-3 Hamming guarantee is
  * a pigeonhole over FOUR bands and holds at any band width. */
class MediaBandWidthSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 8
  private val NFill = 4096
  private val NPlanted = 60

  /** Deterministic corpus at the (doc_id, phash) level: NFill
    * uniform-ish fill hashes plus NPlanted planted pairs at Hamming
    * distance exactly 3 (ids ≥ 1e6 mark the planted set). `bits`
    * masks hashes down to the banded width so the 32-bit run never
    * sees bits its bands don't cover. */
  private def corpus(bits: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val fill = (0 until NFill).map(i => (i.toLong, rnd.nextLong() & mask))
    val planted = (0 until NPlanted).flatMap { g =>
      val base = rnd.nextLong() & mask
      val flips = rnd.shuffle((0 until bits).toList).take(3)
        .map(1L << _).reduce(_ | _)
      Seq((1000000L + 2 * g, base), (1000001L + 2 * g, base ^ flips))
    }
    (fill ++ planted).toDF("doc_id", "phash")
  }

  /** Planted pairs surfaced by a pairs run (both ends in the planted
    * id range and 2·g-aligned). */
  private def plantedFound(pairs: org.apache.spark.sql.DataFrame): Long =
    pairs.filter(col("id_a") >= 1000000L && col("id_b") === col("id_a") + 1
        && pmod(col("id_a"), lit(2)) === 0).count()

  test("8-bit bands saturate at corpus >> 1024·cap: the member cap drops planted pairs") {
    val pairs = Multimodal.phashPairs(corpus(bits = 32, seed = 7), Cap, bandBits = 8)
    val found = plantedFound(pairs)
    // 4096 fill hashes → ~16-20 members per 8-bit bucket > Cap — most
    // planted pairs sit past some bucket's cap prefix in ALL the bands
    // they share; a handful still slip through sparse buckets
    assert(found < NPlanted,
      s"expected saturation loss, found $found of $NPlanted")
  }

  test("16-bit bands on a 64-bit hash: same cap, same corpus size, zero loss") {
    val pairs = Multimodal.phashPairs(corpus(bits = 64, seed = 7), Cap, bandBits = 16)
    assert(plantedFound(pairs) == NPlanted,
      "4 × 65536 buckets hold ~0.06 members each — no cap can bind")
    // and the radius guarantee is still exact: every reported pair
    // verifies at Hamming ≤ 3
    assert(pairs.filter(col("hamming") > 3).isEmpty)
  }

  test("below saturation the two widths agree on the planted set") {
    // a corpus small enough that 8-bit buckets stay under the cap:
    // both configurations must find every planted pair
    val rnd = new scala.util.Random(11)
    val small = ((0 until 100).map(i => (i.toLong, rnd.nextLong())) ++
      (0 until 20).flatMap { g =>
        val base = rnd.nextLong()
        val flips = rnd.shuffle((0 until 64).toList).take(2).map(1L << _).reduce(_ | _)
        Seq((1000000L + 2 * g, base), (1000001L + 2 * g, base ^ flips))
      }).toDF("doc_id", "phash")
    // 32-bit banding needs 32-bit hashes: mask AND re-plant distances
    // inside the low word for the 8-bit run
    val small32 = small.withColumn("phash", col("phash") bitwiseAND lit(0xFFFFFFFFL))
    val f8 = plantedFound(Multimodal.phashPairs(small32, Cap, bandBits = 8))
    val f16 = plantedFound(Multimodal.phashPairs(small, Cap, bandBits = 16))
    assert(f16 == 20, s"16-bit found $f16")
    // masking to 32 bits can merge a planted pair's distance to < 3
    // but never increase it, so the full planted set must still pair
    assert(f8 == 20, s"8-bit found $f8")
  }

  test("hot-bucket skew at 16-bit width: the bucket cap is the residual recall dial") {
    // one genuinely hot band-0 bucket (shared low-16 value) holding
    // 720 DISTINCT hashes — the x30-rung shape where width no longer
    // helps and the cap binds. Planted twins differ by one bit in each
    // of bands 1..3, so the hot bucket is the ONLY band they share:
    // a capped prefix there is their single path to candidacy.
    val rnd = new scala.util.Random(13)
    val band0 = 0xBEEFL
    def hot(hi48: Long) = band0 | (hi48 << 16)
    val fill = (0 until 600).map(i => (i.toLong, hot(rnd.nextLong() >>> 16)))
    val planted = (0 until 60).flatMap { g =>
      val base = hot(rnd.nextLong() >>> 16)
      Seq((1000000L + 2 * g, base),
        (1000001L + 2 * g, base ^ (1L << 20) ^ (1L << 36) ^ (1L << 52)))
    }
    // plus exact-dup doc pairs riding ONE shared hash: collapse-then-
    // band makes distance-0 recall cap-independent — pin that too
    val exact = Seq((2000000L, hot(42L)), (2000001L, hot(42L)))
    val ph = (fill ++ planted ++ exact).toDF("doc_id", "phash")
    val at128 = Multimodal.phashPairs(ph, 128, bandBits = 16)
    val at1024 = Multimodal.phashPairs(ph, 1024, bandBits = 16)
    // restrict to the planted id range — the exact-dup pair at 2e6
    // would otherwise satisfy the id_b = id_a + 1 filter too
    def plantedIn(pairs: org.apache.spark.sql.DataFrame): Long =
      plantedFound(pairs.filter(col("id_a") < 2000000L))
    val lost = 60 - plantedIn(at128)
    assert(lost > 0, "expected the 128-cap prefix of a 720-member bucket to drop planted pairs")
    assert(plantedIn(at1024) == 60,
      "a cap above the hot bucket's occupancy recovers every planted pair")
    // distance-0 pairs survive ANY cap: they ride the group collapse,
    // never the band join
    for (pairs <- Seq(at128, at1024))
      assert(pairs.filter(col("id_a") === 2000000L && col("id_b") === 2000001L
        && col("hamming") === 0L).count() == 1)
  }

  // ---- streaming membrane: the same width flows through MediaIngest

  // 64 blocks of 10 chars (phashWide at 64 bits): flipping block b
  // sets bit b — MediaPipelineSpec's payload scheme at double width
  private val base64 = "ab" * 320
  private def pb64(bits: Int*) = {
    val sb = new StringBuilder(base64)
    bits.foreach(b => (0 until 10).foreach(i => sb.setCharAt(b * 10 + i, 'z')))
    sb.toString
  }

  test("MediaIngest at 16-bit bands: cross-batch Hamming-1 rejection on the 64-bit hash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mbw").toString + "/m"
    graft.stream.MediaIngest.ingestBatch(
      Seq((1L, pb64(40, 50)), (2L, pb64(10, 20, 30, 60)))
        .toDF("doc_id", "media"), dir, epochId = 0, bandBits = 16)
    graft.stream.MediaIngest.ingestBatch(
      Seq((3L, pb64(40, 50, 63)),      // dist 1 from admitted doc 1 (bit 63: sign bit works)
          (4L, pb64(11, 21, 31, 61)))  // dist 8 from doc 2 — admitted
        .toDF("doc_id", "media"), dir, epochId = 1, bandBits = 16)
    val kept = spark.read.parquet(s"$dir/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L), s"kept: $kept")
  }

  test("band width is pinned per store: probing at a different width refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mbw_pin").toString + "/m"
    graft.stream.MediaIngest.ingestBatch(
      Seq((1L, pb64(40, 50))).toDF("doc_id", "media"), dir, epochId = 0, bandBits = 16)
    val e = intercept[IllegalArgumentException] {
      graft.stream.MediaIngest.ingestBatch(
        Seq((2L, pb64(40))).toDF("doc_id", "media"), dir, epochId = 1, bandBits = 8)
    }
    assert(e.getMessage.contains("pinned"))
  }
}
