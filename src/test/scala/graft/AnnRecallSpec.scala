package graft

import org.apache.spark.sql.functions._

import graft.batch.{Dedup, IvfIndex, Similarity}
import graft.functions.GraftFunctions

/** Fixture-scale floor for the ANN *search* path's recall — the spec
  * leg of AnnScaleBench's rung audit (VERDICT r10 ask #3). The rung
  * measurements (BASELINE.md r11 row) show planted-twin hit@1 at the
  * audited probe width holding 92–98.5% from 1× to 30× while p = 1
  * gives only 53–66%: the probe width IS the recall dial, because
  * search's corpus side is SINGLE-assigned (each vector lives in
  * exactly one cell) while the dedup seam multi-probes both sides —
  * a twin query finds its base iff the base's one home cell is among
  * the query's p nearest centroids. This spec pins the fixture-scale
  * floor for both signals so a quantizer/probe regression is caught
  * in CI, not at the next rung run. */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def withNrm(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("nrm",
      sqrt(GraftFunctions.vec_dot(col("embedding"), col("embedding"))))

  test("sqrt(N)-cell search: planted-twin hit@1 and brute-force recall@10 floors") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val nm = withNrm(emb).localCheckpoint()
    val n = nm.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val dir = java.nio.file.Files.createTempDirectory("annrecall").toString
    IvfIndex.build(emb, dir, nCells)

    // ~100 planted out-of-corpus twin queries (baseMod 5 on the 500-vec
    // fixture; the rung bench's N/200 rule would yield modulus 2, which
    // the %-== 3 base pick cannot hit)
    val maxId = nm.agg(max(col("vec_id"))).head.getLong(0)
    val plantOffset = (maxId / 100 + 1) * 100
    val twins = AnnScaleBench.plantTwins(nm, baseMod = 5L, plantOffset)
    val nTwin = twins.count()
    assert(nTwin >= 90, s"fixture must plant ~100 twins, got $nTwin")
    val twinHits = IvfIndex.search(spark, dir, twins, 10, Dedup.ProbeCells)
      .filter(col("rank") === 1 &&
        col("neighbor_id") === col("qid") - lit(plantOffset))
      .count()
    // rung-measured: 197/200 at 1×, 184/200 at 30×; the fixture floor
    // sits safely under the 1× value so slot noise can't flake it,
    // and far above the p=1 regime (~53–66%) a probe regression gives
    assert(twinHits >= (nTwin * 85) / 100,
      s"twin hit@1 $twinHits/$nTwin under ${Dedup.ProbeCells}-probe search")

    // brute-force recall@10 over ~100 in-corpus queries
    val sampleQ = nm.filter(pmod(col("vec_id"), lit(5)) === 1)
      .select("vec_id", "embedding").localCheckpoint()
    val nQ = sampleQ.count()
    val exact = Similarity.knnTopK(emb, sampleQ.select("vec_id"), 10)
      .select(col("qid"), col("neighbor_id"))
    val found = IvfIndex.search(spark, dir, sampleQ, 10, Dedup.ProbeCells)
      .select(col("qid"), col("neighbor_id"))
    val hits = exact.join(found, Seq("qid", "neighbor_id"), "left_semi").count()
    val recall = hits.toDouble / (nQ * 10)
    // weak-neighbor recall on a RANDOM corpus is probe-bounded by
    // design (the exact top-10 of a random query are barely-correlated
    // vectors spread uniformly over cells); at the fixture's 23 cells
    // the 5-probe covers ~22% of the corpus and the rung run measured
    // 0.34 at 1× — pin well above the ~random-baseline and under the
    // measured value
    assert(recall >= 0.25, s"recall@10 = $recall over $nQ queries")
  }
}
