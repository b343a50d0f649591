package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** ScaleGen's contract: rungs are ISOMORPHIC copies — replica 0 is the
  * source bit-for-bit, text structure doubles exactly at x2 (letter
  * bijections cannot collide across replicas), and the embedding map
  * is the exact signed permutation (an isometry, so within-replica
  * geometry is preserved by construction). */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private val src = "/root/testdata/sf0.01"

  test("per-replica maps are deterministic bijections / signed permutations") {
    assert(ScaleGen.letterImage(0) == ScaleGen.Letters)
    (1 to 3).foreach { k =>
      val img = ScaleGen.letterImage(k)
      assert(img.sorted == ScaleGen.Letters, s"replica $k image not a bijection")
      assert(img != ScaleGen.Letters, s"replica $k image is the identity")
      assert(img == ScaleGen.letterImage(k), "letterImage must be deterministic")
    }
    val (p, s) = ScaleGen.coordPerm(2, 64)
    assert(p.sorted.toSeq == (0 until 64), "coord map not a permutation")
    assert(s.forall(v => v == 1f || v == -1f))
    assert(p.toSeq == ScaleGen.coordPerm(2, 64)._1.toSeq, "coordPerm must be deterministic")
    val (p0, s0) = ScaleGen.coordPerm(0, 8)
    assert(p0.toSeq == (0 until 8) && s0.forall(_ == 1f), "replica 0 must be identity")
  }

  test("x1 rung reproduces the source content exactly") {
    val dir = Files.createTempDirectory("graft_scale_x1").toString
    ScaleGen.amplify(spark, src, dir, replicas = 1)
    def docRows(d: String) = Tables.documents(spark, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSet
    assert(docRows(dir) == docRows(src))
    def embRows(d: String) = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq, r.getInt(2))).toSet
    assert(embRows(dir) == embRows(src))
    // idempotence: a second call with the same params is a no-op (the
    // manifest short-circuits), not a regeneration
    val mtime = new java.io.File(s"$dir/SCALEGEN.json").lastModified()
    ScaleGen.amplify(spark, src, dir, replicas = 1)
    assert(new java.io.File(s"$dir/SCALEGEN.json").lastModified() == mtime)
  }

  test("x2 doubles text structure exactly and applies the exact signed permutation") {
    val dir = Files.createTempDirectory("graft_scale_x2").toString
    ScaleGen.amplify(spark, src, dir, replicas = 2)
    val off = ScaleGen.replicaOffset(Tables.documents(spark, src))
    assert(off == 500L, s"sf0.01 offset should be 500, got $off")

    assert(Tables.documents(spark, dir).count()
      == 2 * Tables.documents(spark, src).count())
    assert(Tables.embeddings(spark, dir).count()
      == 2 * Tables.embeddings(spark, src).count())
    // residue splits (eval %10, centroid %100) are preserved per replica
    assert(Tables.documents(spark, dir).filter(pmod(col("doc_id"), lit(10)) === 7).count()
      == 2 * Tables.documents(spark, src).filter(pmod(col("doc_id"), lit(10)) === 7).count())

    // exact-dup structure doubles per source: a letter bijection keeps
    // within-replica equality and cannot create cross-replica equality
    val base = SparkEntry.queries("qd1_exact_dedup")(spark, src)
      .as[(String, Long, Long, Long)].collect()
    val amp = SparkEntry.queries("qd1_exact_dedup")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(amp.map(r => (r._1, r._2, r._3, r._4)).toSet
      == base.map(r => (r._1, 2 * r._2, 2 * r._3, 2 * r._4)).toSet,
      "per-source doc/unique counts must exactly double")

    // replica-1 embedding rows are the exact signed permutation of
    // their twin — geometry preservation then follows mathematically
    val dim = 64
    val (p, sg) = ScaleGen.coordPerm(1, dim)
    val srcV = Tables.embeddings(spark, src).filter(col("vec_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ampV = Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= off && col("vec_id") < off + 5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    srcV.foreach { case (id, v) =>
      val got = ampV(id + off)
      val want = Array.tabulate(dim)(j => v(p(j)) * sg(j))
      assert(got.toSeq == want.toSeq, s"vec $id replica-1 image mismatch")
    }
  }

  test("relational x2 rung is join-closed, residue-preserving, dims fixed") {
    val dir = Files.createTempDirectory("graft_scale_rel").toString
    ScaleGen.amplifyRelational(spark, src, dir, replicas = 2)

    // fixed dims: byte-equal content, cardinality does NOT scale
    assert(Tables.nation(spark, dir).collect().toSet
      == Tables.nation(spark, src).collect().toSet)
    assert(Tables.region(spark, dir).count() == 5)

    // fact/dim counts scale by R; key domains stay disjoint per replica
    Seq("customer", "supplier", "part", "orders", "lineitem", "events")
      .foreach { t =>
        assert(Tables(spark, dir, t).count() == 2 * Tables(spark, src, t).count(),
          s"$t count must double")
      }
    assert(Tables.orders(spark, dir).select("o_orderkey").distinct().count()
      == 2 * Tables.orders(spark, src).count(), "replica orderkeys must be disjoint")

    // join closure: each replica is a complete copy of the FK graph,
    // so the 3-way join count scales exactly by R (no cross-replica edges)
    def join3(d: String) = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .count()
    assert(join3(dir) == 2 * join3(src))

    // residue classes survive the offset (offsets are multiples of the
    // moduli LCM), so modular samples select isomorphic subsets
    assert(ScaleGen.KeyResidueLcm % 997 == 0 && ScaleGen.KeyResidueLcm % 256 == 0
      && ScaleGen.KeyResidueLcm % 500 == 0 && ScaleGen.KeyResidueLcm % 3 == 0)
    def res997(d: String) = Tables.lineitem(spark, d)
      .filter(pmod(col("l_orderkey"), lit(997)) === 0).count()
    assert(res997(dir) == 2 * res997(src))

    // events ts round-trips as naive µs: Tables.events must read the
    // rung exactly as it reads a driver fixture (same values)
    val srcTs = Tables.events(spark, src).orderBy("event_id")
      .select("ts").limit(5).collect().map(_.getTimestamp(0)).toSeq
    val rungTs = Tables.events(spark, dir).orderBy("event_id")
      .select("ts").limit(5).collect().map(_.getTimestamp(0)).toSeq
    assert(rungTs == srcTs)

    // a relational oracle query's per-group counts double exactly while
    // group cardinality holds (the normal shape of a scaled fact table)
    def q1counts(d: String) = SparkEntry.queries("q1_agg")(spark, d)
      .select("l_returnflag", "l_linestatus", "count_order")
      .as[(String, String, Long)].collect()
      .map { case (f, st, n) => (f, st) -> n }.toMap
    val b1 = q1counts(src).map { case ((f, st), n) => (f, st) -> 2 * n }
    assert(q1counts(dir) == b1, "q1 per-group counts must exactly double")
  }
}
