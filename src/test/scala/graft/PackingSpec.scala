package graft

import org.apache.spark.sql.functions._

import graft.batch.TextOps

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val cap = 100L

  test("packFirstFit: no bin exceeds capacity; oversized docs are singletons") {
    val sizes = Seq(250L, 90L, 80L, 60L, 40L, 40L, 30L, 20L, 10L, 10L)
    val df = sizes.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "tok")
    val packed = TextOps.packFirstFit(df, cap, parallelism = 2)

    val perBin = packed.groupBy("bin")
      .agg(sum(least(col("tok"), lit(cap))).as("used"), count(lit(1)).as("n"),
        max("tok").as("biggest"))
      .collect()
    assert(perBin.forall(_.getLong(1) <= cap), "a bin over capacity")
    // the 250-token doc sits alone in its bin
    val over = perBin.filter(_.getLong(3) > cap)
    assert(over.length == 1 && over.head.getLong(2) == 1L)
    // every doc assigned exactly once
    assert(packed.select("doc_id").distinct().count() == sizes.length)
  }

  test("qt6 prefix sum matches a sequential reference and plans no global window") {
    // the two-pass distributed prefix sum must be bit-identical to the
    // sequential computation AND must never funnel the corpus through
    // a single-partition WindowExec (the 100 TB killer it replaced)
    val d = "/root/testdata/sf0.001"
    val q = TextOps.qt6_seq_pack(spark, d)
    assert(!q.queryExecution.executedPlan.toString.contains("Window"),
      "qt6 must not plan a window operator")
    val seq = Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
      .as[(Long, Long)].collect().sortBy { case (id, tok) => (-tok, id) }
    var off = 0L
    val bins = seq.map { case (id, tok) => val b = off / 2048L; off += tok; (b, id, tok) }
    val expected = bins.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, g) =>
      (b, g.length.toLong, g.map(_._3).sum, g.map(_._2).min) }
    val got = q.as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, s"prefix-sum bins diverged from sequential reference")
  }

  test("qt8 mixture: rate table broadcasts, corpus rows never shuffle") {
    // the corpus-side exchanges must all carry source-cardinality
    // aggregates; doc-level rows reach the admission filter map-side
    val q = TextOps.qt8_mixture(spark, "/root/testdata/sf0.001")
    // formatted explain lists each Exchange node with its input columns
    // (AQE hides the physical children from a plan collect)
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = explained.linesIterator.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => i
    }.toSeq
    assert(exchangeInputs.nonEmpty, "expected the source-aggregate exchanges")
    val lines = explained.linesIterator.toVector
    exchangeInputs.foreach { i =>
      // the "Input" line follows the node header
      val input = lines.drop(i).take(3).find(_.trim.startsWith("Input")).getOrElse("")
      assert(!input.contains("doc_id"),
        s"doc-level rows entered a shuffle: $input")
    }
    assert(explained.contains("BroadcastHashJoin"),
      "rate table must broadcast back onto the corpus")
  }

  test("qt10 plans no corpus window: admission is broadcast joins + one agg exchange") {
    // the per-source running-sum window (one task per source — the
    // 100 TB killer) must be gone: the final plan is a Union of two
    // BroadcastHashJoins (full-admit groups, boundary prefix) and the
    // only visible exchanges carry aggregate rows, never doc_id. The
    // checkpointed subplans are shuffle-bounded by construction: the
    // histogram exchange is post-partial-agg (source×score rows) and
    // the boundary prefix sum range-partitions only the straddling
    // score group across defaultParallelism tasks.
    val q = TextOps.qt10_token_budget(spark, "/root/testdata/sf0.001")
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!explained.contains("Window"),
      "qt10 must not plan a window over corpus rows")
    assert(explained.contains("Union"), "two admission paths union")
    val lines = explained.linesIterator.toVector
    val exchangeIdx = lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => i
    }
    assert(exchangeIdx.nonEmpty, "expected the post-aggregate exchange")
    exchangeIdx.foreach { i =>
      val input = lines.drop(i).take(3).find(_.trim.startsWith("Input")).getOrElse("")
      assert(!input.contains("doc_id"),
        s"doc-level rows entered a shuffle: $input")
    }
  }

  test("admitUnderBudget ≡ running-sum window reference, incl. one-score skew") {
    // the inventory-then-admit form must reproduce the greedy window
    // semantics exactly — including when an ENTIRE source sits at one
    // score (the skew case the boundary prefix sum exists for) and
    // when budgets land exactly on a doc boundary
    val rng = new scala.util.Random(20260813)
    for (trial <- 1 to 5) {
      val nDocs = 50 + rng.nextInt(300)
      val budget = 50L + rng.nextInt(400)
      val skewed = trial % 2 == 0 // every doc the same score
      val rows = (0 until nDocs).map { i =>
        val src = s"s${i % 3}"
        val tok = 1L + rng.nextInt(30)
        val score = if (skewed) 7L else rng.nextInt(5).toLong
        (i.toLong, src, tok, score)
      }
      val scored = rows.toDF("doc_id", "source", "n_tok", "score")
      val got = TextOps.admitUnderBudget(scored, budget)
        .as[(String, Long, Long)].collect().toSet
      // sequential reference: per source, (score desc, doc_id asc)
      // prefix while cum <= budget
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy { case (id, _, _, sc) => (-sc, id) }.flatMap {
          case (id, _, tok, _) =>
            cum += tok
            if (cum <= budget) Some((src, id, tok)) else None
        }
      }.toSet
      assert(got == expected,
        s"trial $trial (n=$nDocs budget=$budget skew=$skewed) diverged")
    }
  }

  test("prefixBins property: distributed ≡ sequential on random workloads") {
    // random doc-size distributions, including heavy skew and ties —
    // the distributed two-pass prefix sum must agree with a sequential
    // fold on every one of them
    val rng = new scala.util.Random(20260812)
    for (trial <- 1 to 6) {
      val nDocs = 1 + rng.nextInt(400)
      val capT = 16L + rng.nextInt(200)
      val sizes = (0 until nDocs).map { i =>
        val t = rng.nextInt(4) match {
          case 0 => rng.nextInt(5).toLong          // tiny (many ties, zeros)
          case 1 => rng.nextInt(50).toLong
          case 2 => rng.nextInt(500).toLong
          case _ => 1000L + rng.nextInt(2000)      // oversized vs cap
        }
        (i.toLong, t)
      }
      val got = TextOps.prefixBins(sizes.toDF("doc_id", "tok"), capT)
        .as[(Long, Long, Long, Long)].collect().toSeq
      var off = 0L
      val expected = sizes.sortBy { case (id, tok) => (-tok, id) }
        .map { case (id, tok) => val b = off / capT; off += tok; (b, id, tok) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, g) => (b, g.length.toLong, g.map(_._3).sum, g.map(_._2).min) }
      assert(got == expected, s"trial $trial (n=$nDocs cap=$capT) diverged")
    }
  }

  test("packFirstFit: bin count stays near the lower bound") {
    // 400 docs, sizes 1..50 uniform: total 10200 → lower bound 102 bins
    val df = spark.range(400)
      .select(col("id").as("doc_id"), (col("id") % 50 + 1).as("tok"))
    val packed = TextOps.packFirstFit(df, cap, parallelism = 4)
    val bins = packed.select("bin").distinct().count()
    val totalTok = packed.agg(sum("tok")).head().getLong(0)
    val lower = math.ceil(totalTok.toDouble / cap).toLong
    assert(bins >= lower, s"impossible: $bins < lower bound $lower")
    // FFD guarantee is 11/9·OPT+1 per partition; partition-local packing
    // adds at most one ragged bin per partition on top
    assert(bins <= math.ceil(lower * 11.0 / 9).toLong + 4, s"too loose: $bins bins for lower bound $lower")
    val used = packed.groupBy("bin").agg(sum("tok").as("used"))
    assert(used.filter(col("used") > cap).count() == 0)
  }
}
