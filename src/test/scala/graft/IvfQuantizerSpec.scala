package graft

import org.apache.spark.sql.functions._

import graft.batch.{Dedup, IvfIndex}
import graft.functions.GraftFunctions

/** Pins that [[Dedup.cellNearDup]] — the quantizer-injected seam qd13
  * and qc2 share — is agnostic to WHERE its centroids come from:
  *
  *   1. qd13 ≡ cellNearDup(fixture centroid frame): the refactor seam.
  *   2. Centroids round-tripped through [[IvfIndex]]'s persisted
  *      `centroids/` parquet layout produce BIT-IDENTICAL pairs — the
  *      claim that lets production swap the in-query fixture sample
  *      (C ∝ N, an oracle determinism device) for a persisted index
  *      built at `nCells ∝ √N` without touching the dedup semantics.
  *      Floats survive the parquet round trip exactly, and the
  *      cid-sorted broadcast array is rebuilt identically from disk.
  *   3. An actual [[IvfIndex.build]] quantizer (md5-sampled centroids,
  *      √N cells) drives the same machinery and recalls the exact
  *      baseline's pairs on the shared sample — the recall floor that
  *      [[graft.IvfScaleBench]] re-audits at the scale rungs.
  */
class IvfQuantizerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def fixtureEmb = Tables.embeddings(spark, sf)
    .withColumn("nrm",
      sqrt(GraftFunctions.vec_dot(col("embedding"), col("embedding"))))
    .localCheckpoint()

  private def fixtureCents(emb: org.apache.spark.sql.DataFrame) =
    emb.filter(pmod(col("vec_id"), lit(100)) === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "rcos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("qd13 is exactly cellNearDup over the fixture quantizer") {
    val emb = fixtureEmb
    val direct = pairSet(Dedup.cellNearDup(emb, fixtureCents(emb), tau = 0.4))
    val viaQuery = pairSet(Dedup.qd13_cell_neardup(spark, sf))
    assert(direct === viaQuery)
    assert(direct.nonEmpty, "the fixture must produce near-dup pairs")
  }

  test("centroids persisted in the index layout are pair-for-pair identical") {
    val dir = java.nio.file.Files.createTempDirectory("ivfquant").toString
    val emb = fixtureEmb
    val cents = fixtureCents(emb)
    // the same write IvfIndex.build uses for its quantizer
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val fromDisk = spark.read.parquet(s"$dir/centroids")
    assert(pairSet(Dedup.cellNearDup(emb, fromDisk, tau = 0.4)) ===
      pairSet(Dedup.cellNearDup(emb, cents, tau = 0.4)))
  }

  test("a built sqrt(N)-cell IvfIndex quantizer recalls the exact sample pairs") {
    val dir = java.nio.file.Files.createTempDirectory("ivfbuild").toString
    val emb = fixtureEmb
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    IvfIndex.build(Tables.embeddings(spark, sf), dir, nCells)
    val cents = spark.read.parquet(s"$dir/centroids")
    assert(cents.count() === nCells.toLong)

    val found = Dedup.cellNearDup(emb, cents, tau = 0.4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // qd5's exact all-pairs ground truth on the odd-vec_id sample;
    // band-4 boundary pairs are what multi-probe exists to keep
    val exact = Dedup.qd5_embedding_neardup(spark, sf)
      .select("keep_id", "dup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recalled = exact.count(found.contains)
    // the p=5 probe pin recalls 11/11 at sf0.01 on the fixture
    // quantizer; the sqrt(N) index must not fall below 80% here — the
    // per-rung audit with banded deciles lives in IvfScaleBench
    assert(recalled * 100 >= exact.size * 80,
      s"sqrt(N)-cell recall too low: $recalled of ${exact.size}")
  }

  test("qd16 is exactly cellNearDup over a persisted built index with the occupancy cap") {
    // the oracle-gated production query (sqrt(N) md5-sampled cells,
    // occupancy-sized cap) must be bit-identical to running the seam
    // over an IvfIndex.build quantizer read back from disk — i.e. the
    // in-query centroid rule IS build's rule, not a lookalike
    val dir = java.nio.file.Files.createTempDirectory("ivfqd16").toString
    val emb = fixtureEmb
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    IvfIndex.build(Tables.embeddings(spark, sf), dir, nCells)
    val cents = spark.read.parquet(s"$dir/centroids")
    val cap = Dedup.occupancyCap(n, nCells)
    // pin the actual sizing rule (max of the floor and headroom·p·N/C),
    // so a regression in the headroom/probes formula is caught — the
    // floor-only comparison was tautological (occupancyCap already
    // takes math.max with CellCap)
    assert(cap === math.max(Dedup.CellCap,
      (4L * Dedup.ProbeCells * n / math.max(1, nCells)).toInt),
      "occupancy cap = max(floor, headroom(4) * probes * N / C)")
    val viaIndex = pairSet(Dedup.cellNearDup(emb, cents, tau = 0.4, cap = cap))
    val viaQuery = pairSet(Dedup.qd16_ivf_neardup(spark, sf))
    assert(viaIndex === viaQuery)
    assert(viaQuery.nonEmpty, "the production-sized quantizer must produce pairs")
  }
}
