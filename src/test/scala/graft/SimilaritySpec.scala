package graft

import graft.batch.Similarity

/** ANN quality: the bucketed variants must agree with the brute-force
  * baseline where they claim a neighbor — and find one for a usable
  * fraction of queries (recall floor on the small fixture).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("fixtures contain no zero-norm embedding (the quantizer oracles' standing assumption)") {
    // Spark's probe EXCLUDES a zero-norm vector/centroid (NaN score)
    // while a DuckDB ORDER BY would rank its NaN crcos first — qs7/qs8
    // guard this explicitly (cn/nrm > 0 in their oracles), the older
    // embedding oracles (qs3/qs5, qd13/qd15/qd16, qc2-qc4) rely on the
    // fixtures having none. Pin the assumption so a fixture
    // regeneration that violates it fails HERE with a pointer, not as
    // an inscrutable hash mismatch in eight oracles.
    // sf0.1 included: it is the Bench contract fixture AND the ScaleGen
    // amplification source, so a zero-norm vector there would poison
    // every rung too
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val zeros = Tables.embeddings(spark, s"/root/testdata/$sf")
        .filter(org.apache.spark.sql.functions.expr(
          "array_max(transform(embedding, v -> abs(cast(v as double)))) <= 0"))
        .count()
      assert(zeros === 0L,
        s"$sf has $zeros zero-norm embeddings — add cn/nrm > 0 guards to the " +
          "older quantizer oracles (qs7/qs8's pattern) before trusting the gate")
    }
  }

  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN: never beats brute force, always prunes, finds true neighbors") {
    val brute = Similarity.qs1_knn_bruteforce(spark, dir)
      .select($"qid", $"rank", $"neighbor_id", $"rcos")
      .as[(Long, Int, Long, Double)].collect()
    val top1Cos = brute.filter(_._2 == 1).map(r => r._1 -> r._4).toMap
    val top3 = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ann = Similarity.qs2_ann_lsh(spark, dir)
      .select($"qid", $"n_candidates", $"best_id", $"best_rcos")
      .as[(Long, Long, Option[Long], Option[Double])].collect()
    val corpus = Tables.embeddings(spark, dir).count()
    // pruning: a bucket probe never scans the whole corpus
    assert(ann.forall(_._2 < corpus))
    val found = ann.collect { case (q, _, Some(b), Some(c)) => (q, b, c) }
    assert(found.nonEmpty, "LSH found no candidates at all")
    // an approximate best can never exceed the true best similarity
    assert(found.forall { case (q, _, c) => c <= top1Cos(q) + 1e-9 })
    // and at least some in-bucket bests are true top-3 neighbors.
    // (8 hyperplanes = 256 buckets over a 500-vector fixture is
    // deliberately over-partitioned — global recall is expected to be
    // LOW here and to rise with corpus density; this asserts the
    // machinery, the calibration note lives in Similarity's scaladoc.)
    val hits = found.count { case (q, b, _) => top3.getOrElse(q, Set.empty).contains(b) }
    assert(hits >= 1, s"no LSH best was a true top-3 neighbor (0/${found.length})")
  }

  test("IVF ANN: probes its own cell and candidate counts are bounded") {
    val rows = Similarity.qs3_ivf_ann(spark, dir)
      .select($"qid", $"n_candidates").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val corpus = Tables.embeddings(spark, dir).count()
    // cells partition the corpus: a probe never scans everything
    assert(rows.forall(_._2 < corpus))
  }

  test("calibrated LSH recall: clustered corpus, planes sized to density") {
    // 40 well-separated direction clusters × 50 points, dim 16. When
    // planes ≈ log2(n / bucket) is sized for the corpus (4 planes → 16
    // buckets → ~125 vectors/bucket), near neighbors share sign bits
    // and recall@5 is high — this is the calibration claim in
    // Similarity's scaladoc, measured.
    val rnd = new scala.util.Random(42)
    val dim = 16
    val centers = Array.fill(40)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val points = for (c <- centers.indices; p <- 0 until 50) yield {
      val e = centers(c).map(v => v + (rnd.nextDouble() * 2 - 1) * 0.1)
      (c.toLong * 50 + p, e.toSeq)
    }
    val emb = points.toDF("vec_id", "embedding")
    val queryIds = points.indices.by(101).map(i => points(i)._1).toDF("vec_id")

    val k = 5
    val exact = Similarity.knnTopK(emb, queryIds, k)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.annTopK(emb, queryIds, dim, planes = 4, k)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@$k over ${recalls.size} queries: $mean%.3f")
    assert(mean >= 0.6, f"calibrated LSH recall@$k too low: $mean%.3f")
    // sanity: approximate neighbors are never better-than-exact
    assert(approx.keySet.subsetOf(exact.keySet))

    // over-partitioned regime (6 planes → 64 buckets for 2000 vectors):
    // Hamming-1 multi-probe must recover recall lost to bucket splits
    def recallOf(multiProbe: Boolean): Double = {
      val got = Similarity.annTopK(emb, queryIds, dim, planes = 6, k, multiProbe)
        .select($"qid", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
    }
    val single = recallOf(multiProbe = false)
    val multi = recallOf(multiProbe = true)
    info(f"6-plane recall@$k: single-probe $single%.3f, multi-probe $multi%.3f")
    assert(multi > single, f"multi-probe ($multi%.3f) should beat single ($single%.3f)")
    assert(multi >= 0.6, f"multi-probe recall too low: $multi%.3f")

    // a wrong dim must fail loudly, not collapse everything to bucket 0
    val err = intercept[Exception] {
      Similarity.annTopK(emb, queryIds, dim = 32, planes = 4, k).collect()
    }
    assert(err.getMessage != null && err.toString.contains("USER_RAISED_EXCEPTION")
      || err.getMessage.contains("dim"), s"unexpected: $err")
  }
}
