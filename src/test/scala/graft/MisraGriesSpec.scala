package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.MisraGries

/** The mergeable Misra-Gries sketch and qt15's two-pass
  * sketch-then-recount heavy hitters built on it. */
class MisraGriesSpec extends SparkSpec {

  private def tokensDf(toks: Seq[String], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(toks.map(Row(_)), parts),
      StructType(Seq(StructField("tok", StringType))))

  test("local sketch: capacity bound and exact counts when under capacity") {
    val mg = new MisraGries(8)
    val b = ("a b a c a b".split(" ")).foldLeft(mg.zero)(mg.reduce)
    assert(b === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    // overflow keeps ≤ capacity entries
    val big = (1 to 100).map(i => s"t$i").foldLeft(mg.zero)(mg.reduce)
    assert(big.size <= 8)
  }

  test("MG guarantee: every token above N/(cap+1) survives reduces and merges") {
    // adversarial mix: 5 heavy tokens at ~3% each + a long tail of
    // singletons, folded under a small capacity across many partitions
    // (partial sketches merge at the final reducer — the path that
    // would lose heavy hitters if the merge rule were wrong)
    val heavy = (1 to 5).flatMap(h => Seq.fill(300)(s"heavy$h"))
    val tail = (1 to 8500).map(i => s"tail$i")
    val toks = new scala.util.Random(42).shuffle((heavy ++ tail).toVector)
    val n = toks.size // 10000
    val cap = 64      // error ≤ N/65 ≈ 154 < 300
    val out = tokensDf(toks, parts = 7)
      .agg(MisraGries.udafFor(cap)(col("tok")).as("cands"))
      .collect().head.getSeq[String](0).toSet
    (1 to 5).foreach { h =>
      assert(out.contains(s"heavy$h"),
        s"heavy$h (300 of $n > N/${cap + 1}) must be in the candidate set")
    }
    assert(out.size <= cap)
  }

  test("merge is the mergeable-summaries rule: bound holds across splits") {
    val mg = new MisraGries(4)
    val stream = Seq.fill(40)("x") ++ (1 to 60).map(i => s"u$i")
    // arbitrary split points, reduce each side, then merge
    for (split <- Seq(10, 50, 90)) {
      val (l, r) = stream.splitAt(split)
      val merged = mg.merge(
        l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
      // x: true count 40, N=100, error ≤ 100/5 = 20 → sketch ≥ 20 > 0
      assert(merged.getOrElse("x", 0L) >= 40L - 20L,
        s"split=$split: ${merged.get("x")}")
      assert(merged.size <= 4)
    }
  }

  test("property: the MG bound holds on random streams under random split/merge trees") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cap = 8
    val mg = new MisraGries(cap)
    // small alphabets force heavy collisions; random split points force
    // the merge path (not just sequential reduces)
    val streamGen = for {
      alpha <- Gen.choose(3, 30)
      n <- Gen.choose(20, 400)
      toks <- Gen.listOfN(n, Gen.choose(0, alpha - 1).map(i => s"t$i"))
    } yield toks
    (0 until 80).foreach { seed =>
      streamGen(Gen.Parameters.default, Seed(seed.toLong)).foreach { toks =>
        val rnd = new scala.util.Random(seed)
        // random 1-4 way split, each part reduced, merged left-to-right
        val parts = toks.grouped(math.max(1, toks.size / (1 + rnd.nextInt(4)))).toSeq
        val merged = parts.map(_.foldLeft(mg.zero)(mg.reduce)).reduce(mg.merge)
        val truth = toks.groupBy(identity).view.mapValues(_.size.toLong)
        val bound = toks.size.toLong / (cap + 1)
        assert(merged.size <= cap)
        truth.foreach { case (tok, n) =>
          val sk = merged.getOrElse(tok, 0L)
          assert(sk <= n, s"seed=$seed $tok: sketch $sk must lower-bound true $n")
          assert(sk >= n - bound,
            s"seed=$seed $tok: sketch $sk vs true $n exceeds error bound $bound")
        }
      }
    }
  }

  test("qt15 equals the exact full groupBy at fixture scale") {
    val sf = "/root/testdata/sf0.001"
    val toks = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val n = toks.count()
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= lit(n) * 0.01)
      .orderBy(col("n_occ").desc, col("tok"))
      .select("tok", "n_occ").collect()
    val sketched = batch.TextOps.qt15_heavy_hitters(spark, sf)
      .select("tok", "n_occ").collect()
    assert(sketched.toSeq === exact.toSeq)
    assert(exact.nonEmpty)
  }
}
