package graft

import org.apache.spark.sql.functions._

import graft.batch.TextOps

/** qt18's BPE trainer against an INDEPENDENT reference: canonical BPE
  * (word-frequency weighted pair counts, argmax by (count DESC, lhs,
  * rhs), left-to-right non-overlapping merge) implemented here in
  * plain Scala with none of the engine's machinery.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference canonical BPE over a (word → freq) map. */
  private def refBpe(freqs: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = freqs.map { case (w, f) =>
      (w.map(_.toString).toVector :+ "</w>") -> f
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (step <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step, l, r, c))
        vocab = vocab.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def engineMerges(docs: org.apache.spark.sql.DataFrame, n: Int) =
    TextOps.bpeMerges(docs, n)

  private def refFromDocs(docs: org.apache.spark.sql.DataFrame, n: Int) = {
    val freqs = docs.select(explode(expr(
        "filter(split(lower(text), ' '), w -> w rlike '^[a-z0-9]+$')")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    refBpe(freqs, n)
  }

  test("hand corpus: merges match the reference, ties break to (lhs, rhs)") {
    // 'lo' appears in hello/low/lower; ties forced between (l,o) and
    // others at small counts exercise the deterministic tie order
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "low hello hello newest widest widest"
    ).toDF("text")
    val got = engineMerges(docs, 8)
    val want = refFromDocs(docs, 8)
    assert(got == want, s"\nengine: $got\nref:    $want")
    assert(got.nonEmpty && got.map(_._1) == (1 to got.length))
  }

  test("fixture corpus: engine ≡ reference for all 12 merges; the merge " +
    "loop never rescans the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // instrument: the corpus text may be evaluated exactly ONCE (the
    // vocabulary aggregation); the merge loop runs on the vocab table
    val passes = spark.sparkContext.longAccumulator("bpe_text_passes")
    val n = docs.count()
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val got = engineMerges(docs.filter(tick()), 12)
    assert(passes.value == n,
      s"corpus text scanned ${passes.value.toDouble / n}x — must be exactly once")
    assert(got == refFromDocs(docs, 12))
    assert(got.length == 12)
  }

  test("fast trainer ≡ reference loop ≡ independent reference: hand corpus") {
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "low hello hello newest widest widest"
    ).toDF("text")
    val fast = TextOps.bpeTrainFast(docs, 8)._1
    assert(fast == engineMerges(docs, 8))
    assert(fast == refFromDocs(docs, 8))
  }

  test("fast trainer ≡ reference loop on the fixture, DEEP into the merge " +
    "schedule, with the identical final vocabulary") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // 40 merges exercises rounds where every count comes from the
    // incremental deltas, far past the 12 the queries use
    val (fastM, fastV) = TextOps.bpeTrainFast(docs, 40)
    val (slowM, slowV) = TextOps.bpeTrain(docs, 40)
    assert(fastM == slowM,
      s"\nfast: ${fastM.take(5)}…\nslow: ${slowM.take(5)}…")
    // the trained ENCODER must agree word-for-word, not just the merges
    assert(fastV.select("w", "syms").except(slowV.select("w", "syms")).isEmpty)
    assert(slowV.select("w", "syms").except(fastV.select("w", "syms")).isEmpty)
  }

  test("fast trainer: minFreq bounds the head vocabulary; maxVocab fails loudly") {
    val docs = Seq("aa aa aa bb bb cc").toDF("text")
    // minFreq 2 drops cc from the vocabulary before the loop
    val (_, vocab) = TextOps.bpeTrainFast(docs, 4, minFreq = 2L)
    assert(vocab.select("w").as[String].collect().sorted.toSeq == Seq("aa", "bb"))
    val e = intercept[IllegalArgumentException](
      TextOps.bpeTrainFast(docs, 4, maxVocab = 2))
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }

  test("fast trainer handles overlapping-run pairs (l == r) like the reference") {
    // "aaaa"×3, "aaa"×2: pair (a,a) counts overlaps, but the merge is
    // non-overlapping — the classic divergence spot for delta trainers
    val docs = Seq("aaaa aaaa aaaa aaa aaa b").toDF("text")
    val n = 6
    assert(TextOps.bpeTrainFast(docs, n)._1 == engineMerges(docs, n))
    assert(TextOps.bpeTrainFast(docs, n)._1 == refFromDocs(docs, n))
  }

  test("persisted model: save/load round-trips, replay-encode matches the " +
    "trained vocabulary word-for-word, and UNSEEN words encode under it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges, vocab) = TextOps.bpeTrainFast(docs, 12)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    TextOps.saveBpe(spark, dir, merges)
    val loaded = TextOps.loadBpe(spark, dir)
    assert(loaded == merges.map(m => (m._1, m._2, m._3)))
    // replaying the ranked merges over raw characters reproduces the
    // trained encoder for EVERY corpus word (the trainer's own
    // evolution, replayed)
    val replay = TextOps.bpeApply(vocab.select("w"), loaded)
      .select(col("w"), col("syms").as("syms2"))
    assert(vocab.join(replay, "w")
      .filter(col("syms") =!= col("syms2")).isEmpty,
      "replay must equal the trained vocabulary")
    // a word the corpus never held encodes deterministically and still
    // benefits from learned merges: build it from the FIRST learned
    // merge's pair so at least that merge applies
    val (_, l, r) = loaded.head
    val unseen = (l + r) * 2 + "zq" // not a clean corpus word by construction
    val out = TextOps.bpeApply(Seq(unseen).toDF("w"), loaded)
      .select(size(col("syms"))).head().getInt(0)
    assert(out < unseen.length + 1,
      s"'$unseen' must compress below ${unseen.length + 1} raw symbols, got $out")
  }

  test("fast replay encoder ≡ the chained reference form, word-for-word — " +
    "trained vocab, unseen words, and adversarial re-creation cases") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (merges0, vocab) = TextOps.bpeTrainFast(docs, 12)
    val merges = merges0.map(m => (m._1, m._2, m._3))
    // every trained word plus constructed stressors: the first merge's
    // pair doubled, long runs (overlap handling), and a word where a
    // LATER merge re-creates an EARLIER merge's pair string — the one
    // case naive min-rank greedy diverges from sequential replay
    val (_, l1, r1) = merges.head
    val words = vocab.select("w").as[String].collect().toSeq ++
      Seq(l1 + r1 + l1 + r1 + "zq", "aaaaaaa", l1 * 3 + r1 * 3, "x", "")
    val wdf = words.toDF("w")
    val fast = TextOps.bpeApply(wdf, merges).select(col("w"), col("syms"))
    val slow = TextOps.bpeApplyChained(wdf, merges)
      .select(col("w"), col("syms").as("syms2"))
    val diff = fast.join(slow, "w").filter(col("syms") =!= col("syms2"))
    assert(diff.isEmpty, diff.collect().take(3).mkString("\n"))
    // adversarial merge LIST (not trainable, but the API accepts any):
    // rank 1 = (b,c)→bc, rank 2 = (abc,d), rank 3 = (a,bc)→abc.
    // Sequential replay of "abcd" runs bc, finds no "abc" at rank 2
    // YET, then builds it at rank 3 → [abc, d]; naive min-rank greedy
    // would fire rank 2 after rank 3 created "abc" → [abcd].
    val adv = Seq((1, "b", "c"), (2, "abc", "d"), (3, "a", "bc"))
    val advWords = Seq("abcd", "abcdabcd", "dabc").toDF("w")
    val fa = TextOps.bpeApply(advWords, adv).select(col("w"), col("syms"))
    val sa = TextOps.bpeApplyChained(advWords, adv)
      .select(col("w"), col("syms").as("syms2"))
    val d2 = fa.join(sa, "w").filter(col("syms") =!= col("syms2"))
    assert(d2.isEmpty, d2.collect().mkString("\n"))
    assert(fa.filter(col("w") === "abcd").select("syms").as[Seq[String]]
      .head() == Seq("abc", "d", "</w>"))
  }

  test("fast replay at production merge depth: ≥2000 merges reproduce the " +
    "trained vocabulary word-for-word (the chained form cannot get here)") {
    // synthetic distinct-word vocabulary, BpeBench's shape: md5-hex
    // words inside the trainer charset; 20k words give the trainer
    // thousands of distinct pairs to merge
    val docs = spark.range(20000L)
      .select(substring(md5(col("id").cast("string")), 1, 8).as("text"))
    val (merges, vocab) = TextOps.bpeTrainFast(docs, 2000)
    assert(merges.length >= 2000, s"expected ≥2000 merges, got ${merges.length}")
    val replay = TextOps.bpeApply(vocab.select("w"),
        merges.map(m => (m._1, m._2, m._3)))
      .select(col("w"), col("syms").as("syms2"))
    val diff = vocab.join(replay, "w").filter(col("syms") =!= col("syms2"))
    assert(diff.isEmpty,
      "deep replay must equal the trained vocabulary: " +
        diff.collect().take(3).mkString("\n"))
  }

  test("property: fast replay ≡ chained replay on random duplicate-free " +
    "merge lists over random words (25 seeded cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forAll[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
      (0 until n).foreach { i =>
        gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
      }
    // merge symbols over a 3-letter alphabet — random pairs whether or
    // not they can ever fire; duplicate (l, r) pairs deduped to match
    // the trained-artifact contract the encoder documents (a trained
    // list never repeats a pair: its count drops to zero on merging)
    val sym = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val mergeList = Gen.listOfN(12, Gen.zip(sym, sym)).map { ps =>
      ps.distinct.zipWithIndex.map { case ((l, r), i) => (i + 1, l, r) }
    }
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forAll(Gen.zip(mergeList, Gen.listOfN(8, word)), n = 25) {
      case (merges, words0) =>
        val words = words0.distinct
        val wdf = words.toDF("w")
        val fast = TextOps.bpeApply(wdf, merges)
          .select("w", "syms").as[(String, Seq[String])].collect().toMap
        val slow = TextOps.bpeApplyChained(wdf, merges)
          .select("w", "syms").as[(String, Seq[String])].collect().toMap
        assert(fast == slow,
          s"divergence under merges=$merges:\n" +
            words.filter(w => fast(w) != slow(w))
              .map(w => s"  $w: fast=${fast(w)} chained=${slow(w)}").mkString("\n"))
    }
  }

  test("merged symbols compose: a learned merge's pair count never exceeds " +
    "its parents' earlier counts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = engineMerges(docs, 12)
    // monotone argmax: counts are non-increasing in step order only
    // within the SAME pair lineage is not guaranteed, but the picked
    // count can never exceed the previous step's picked count (the
    // previous argmax dominated every pair then, including this one's
    // constituents)
    merges.sliding(2).foreach {
      case Seq((_, _, _, c1), (_, _, _, c2)) =>
        assert(c2 <= c1, s"argmax counts must be non-increasing: $merges")
      case _ =>
    }
  }
}
