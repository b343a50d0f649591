package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.batch.{Dedup, IvfIndex}

/** qd13's cell-bucketed embedding near-dup: boundary-probe recall and
  * the degenerate-corpus member cap. */
class CellNearDupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("top-2 probing strictly extends single-cell pair recall on the fixture") {
    // re-derive the probe table at p=1 and p=2 through the same helpers
    def pairsAtProbes(p: Int): Set[(Long, Long)] = {
      val emb = Tables.embeddings(spark, sf)
        .withColumn("nrm", sqrt(expr("aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
        .localCheckpoint()
      val cents = emb.filter(pmod(col("vec_id"), lit(100)) === 7)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
      val probed = emb.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
        .select(col("vec_id"),
          explode(transform(IvfIndex.topCells(col("embedding"), col("nrm"), p, rounded = true),
            c => c.getField("cid"))).as("cell"))
      probed.as("a").join(probed.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val single = pairsAtProbes(1)
    val multi = pairsAtProbes(Dedup.ProbeCells)
    assert(single.subsetOf(multi), "multi-probe candidates must cover probe-1's")
    assert(multi.size > single.size,
      s"the boundary probes must add candidates (p1=${single.size}, p${Dedup.ProbeCells}=${multi.size})")

    // and qd13's reported pairs are exactly the ≥0.4 subset of its candidates
    val reported = Dedup.qd13_cell_neardup(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reported.subsetOf(multi))
  }

  test("qd21 semantic decontam: the corpus side never shuffles (broadcast " +
    "joins only), hits are recall-consistent with brute force at the tau") {
    val res = Dedup.qd21_semantic_decontam(spark, sf)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      "the eval side must broadcast — a corpus-shuffling join breaks the qd7 rule")
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force cross-set ground truth at the same tau: every flagged
    // doc IS contaminated (precision 1.0 — the probe path only ever
    // scores true cosines), and hit counts never exceed brute's
    val emb = Tables.embeddings(spark, sf)
      .withColumn("nrm", sqrt(expr("aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
      .localCheckpoint()
    val ev = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("eid"), col("embedding").as("ee"), col("nrm").as("en"))
    val brute = emb.filter(pmod(col("vec_id"), lit(25)) =!= 0)
      .crossJoin(broadcast(ev))
      .withColumn("rcos", round(graft.functions.GraftFunctions.vec_dot(
        col("ee"), col("embedding")) / (col("en") * col("nrm")), 6))
      .filter(col("rcos") >= 0.4)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "fixture must produce semantic contamination hits")
    got.foreach { case (id, n) =>
      assert(brute.contains(id), s"doc $id flagged but not contaminated (precision)")
      assert(n <= brute(id), s"doc $id reports $n hits > brute ${brute(id)}")
    }
    // cell-bucketed recall on the fixture: the probe path keeps the
    // large majority of truly contaminated docs (boundary losses only)
    assert(got.size * 10 >= brute.size * 7,
      s"recall ${got.size}/${brute.size} below the 70% fixture floor")
  }

  test("qd21 probe fan-out sweep vs PLANTED paraphrase twins: recall is " +
    "monotone in p, and the production p=5 holds a high floor") {
    val dim = 64
    val emb = Tables.embeddings(spark, sf)
      .withColumn("nrm", sqrt(expr(
        "aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
      .localCheckpoint()
    // plant one paraphrase twin per EVAL doc into the corpus: the
    // hash-parity ε-perturbation (AnnScaleBench's construction,
    // ε = 0.25 → cos ≈ 0.970 — far above SemTau, i.e. every twin IS
    // contamination the membrane must flag)
    val eps = 0.25
    val twins = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        array((0 until dim).map { j =>
          (element_at(col("embedding"), j + 1) +
            (pmod(hash(col("vec_id"), lit(j)), lit(2)) * 2 - 1).cast("float") *
              lit(eps.toFloat) * (col("nrm") / lit(math.sqrt(dim.toDouble))).cast("float"))
            .cast("float")
        }: _*).as("embedding"))
    val enm2 = emb.select(col("vec_id"), col("embedding")).unionByName(twins)
      .withColumn("nrm", sqrt(expr(
        "aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
      .localCheckpoint()
    val cents = enm2.filter(pmod(col("vec_id"), lit(100)) === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    // eval = the original %25 slice only (its planted twins are corpus)
    val isEval = pmod(col("vec_id"), lit(25)) === 0 && col("vec_id") < 1000000L
    val nTwin = twins.count()
    def plantedHits(p: Int): Long =
      graft.batch.Dedup.semanticPairs(enm2, isEval, cents, p)
        .filter(col("vec_id") >= 1000000L &&
          col("eid") === col("vec_id") - 1000000L)
        .count()
    val ps = Seq(1, 3, 5, 10)
    val hits = ps.map(plantedHits)
    // recall never falls as the eval-side fan-out grows (a probed-cell
    // SET only widens), and the production p=5 catches ≥ 90% of
    // planted paraphrase contamination on the fixture
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in p: ${ps.zip(hits)}")
    assert(hits(2) * 10 >= nTwin * 9,
      s"p=5 planted recall ${hits(2)}/$nTwin under the 90% floor")
    assert(nTwin > 0 && hits.last <= nTwin)
  }

  test("degenerate corpus collapsing into one cell is bounded by the member cap") {
    // 2000 near-identical vectors (all land in one cell, all pairwise
    // cosine ≈ 1): candidate pairs must be O(cap²), not O(N²)
    val n = 2000
    val dim = 8
    val rows = (0 until n).map { i =>
      Row(i.toLong, Array.tabulate(dim)(j => 1.0f + (if (j == 0) i * 1e-6f else 0f)))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val emb = df.withColumn("nrm",
      sqrt(expr("aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
    val cents = emb.filter(pmod(col("vec_id"), lit(100)) === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val probed = emb.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
      .select(col("vec_id"),
        explode(transform(
          IvfIndex.topCells(col("embedding"), col("nrm"), Dedup.ProbeCells, rounded = true),
          c => c.getField("cid"))).as("cell"))
    val capped = probed
      .withColumn("rk", row_number().over(Window.partitionBy("cell").orderBy("vec_id")))
      .filter(col("rk") <= Dedup.CellCap).drop("rk")
    val nPairs = capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id")).count()
    val capBound = Dedup.CellCap.toLong * (Dedup.CellCap - 1) / 2
    // 20 centroids of identical vectors → ties broken by cid; every
    // vector probes the same ProbeCells cells, each capped
    assert(nPairs <= Dedup.ProbeCells * capBound,
      s"degenerate cell must stay cap-bounded: $nPairs pairs vs bound ${Dedup.ProbeCells * capBound}")
    assert(nPairs < n.toLong * (n - 1) / 4, "must be far below the uncapped pair space")
  }
}
