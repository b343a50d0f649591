package graft

import org.apache.spark.sql.functions._

import graft.batch.{Curation, Dedup, Multimodal}

/** The composed curation pipeline: output invariants of every stage,
  * plus the scan audit — the corpus text is read exactly once.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("curate: one text pass; every stage's invariant holds on the output") {
    val passes = spark.sparkContext.longAccumulator("curation_text_passes")
    val raw = Tables.documents(spark, d)
    val nRaw = raw.count()
    // instrument the input: each full evaluation of the corpus adds
    // nRaw; the non-deterministic marker stops Catalyst from dropping
    // or reordering the counter out of the scan pass
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val docs = raw.filter(tick())
    val ev = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))

    val p = Curation.Params()
    val out = Curation.curate(docs, ev, p).cache()
    val outRows = out.collect()
    assert(outRows.nonEmpty, "curation must admit documents on the fixture")
    assert(passes.value == nRaw,
      s"corpus text scanned ${passes.value.toDouble / nRaw}x — must be exactly once")

    val ids = outRows.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.distinct.size == ids.size, "each doc packed exactly once")

    // join the admitted ids back to the raw text to verify the gates
    // independently of the pipeline's own signal computation
    val admitted = raw.join(out.select("doc_id"), Seq("doc_id")).cache()

    // quality gates
    val q = admitted
      .withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_dup", col("n_tok") - size(array_distinct(col("toks"))).cast("long"))
    assert(q.filter(col("n_tok") < p.minTok || col("n_dup") * 2 >= col("n_tok")).isEmpty,
      "a quality-rejected doc leaked through")

    // exact dedup: no two admitted docs share content
    val ck = admitted.select(md5(col("text").cast("binary")).as("ck"))
    assert(ck.count() == ck.distinct().count(), "admitted exact dup")

    // near dedup: no two admitted docs share an LSH band
    val bandDup = admitted.withColumn("b", explode(Dedup.bandKeys(col("text"))))
      .filter(col("b.key").isNotNull)
      .groupBy(col("b.band"), col("b.key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(bandDup.isEmpty, "two admitted docs share a band")

    // decontamination: no admitted doc shares an aligned 32-char window
    // with the eval set (the stride-guaranteed detection class)
    val corpusFp = admitted.filter(length(col("text")) >= 32)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast((length(text) - 32) div 16 as int)), " +
          "i -> md5(cast(substring(text, 1 + 16 * i, 32) as binary)))")).as("fp"))
    val evFp = ev.filter(length(col("text")) >= 32)
      .select(explode(expr(
        "transform(sequence(0, length(text) - 32), " +
          "i -> md5(cast(substring(text, 1 + i, 32) as binary)))")).as("fp"))
      .distinct()
    assert(corpusFp.join(evFp, Seq("fp")).isEmpty, "contaminated doc admitted")

    // packing: no bin over capacity (oversized docs are singletons)
    val overfull = out.groupBy("bin")
      .agg(sum(least(col("tok"), lit(p.packCapacity))).as("used"))
      .filter(col("used") > p.packCapacity)
    assert(overfull.isEmpty, "a packed bin exceeds capacity")

    out.unpersist(); admitted.unpersist()
  }

  test("qc2: media + embedding membranes hold on the output; phash rides pass 1") {
    val out = Curation.qc2_multimodal_curation(spark, d).cache()
    assert(out.count() > 0, "multimodal curation must admit documents")

    val all = Tables.spread(Tables.documents(spark, d))
    val admitted = all.join(out.select("doc_id"), Seq("doc_id")).cache()

    // media invariant: the banded detection class must find NO surviving
    // near-dup pair — any Hamming-≤3 pair would have had its larger id
    // rejected by the membrane
    assert(Multimodal.phashPairs(Multimodal.phash32(admitted),
      Multimodal.PhashBandCap).isEmpty,
      "two admitted docs are perceptual near-duplicates")

    // embedding invariant: re-derive each admitted doc's centroid cell
    // independently; no same-cell pair may reach rounded cosine >= tau
    val dot = (a: String, b: String) => expr(
      s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "0D, (acc, v) -> acc + v)")
    val enm = Tables.embeddings(spark, d)
      .withColumn("nrm", sqrt(dot("embedding", "embedding")))
    val cents = enm.filter(pmod(col("vec_id"), lit(100)) === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val edocs = admitted.select(col("doc_id"))
      .join(enm.select(col("vec_id").as("doc_id"), col("embedding"), col("nrm")), Seq("doc_id"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("crcos").desc, col("cid").asc)
    val assigned = edocs.crossJoin(broadcast(cents))
      .withColumn("crcos", round(dot("ce", "embedding") / (col("cn") * col("nrm")), 6))
      .withColumn("rn", row_number().over(wCell)).filter(col("rn") === 1)
      .select(col("doc_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
    val close = assigned.as("a").join(assigned.as("b"), Seq("cell"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(round(dot("a.embedding", "b.embedding")
        / (col("a.nrm") * col("b.nrm")), 6) >= Curation.Params().cosTau)
    assert(close.isEmpty, "two admitted docs are same-cell embedding near-dups")

    // scan audit: computing the phash signal must NOT add a text pass —
    // cleanedSignals(withPhash = true) still reads the corpus once
    val passes = spark.sparkContext.longAccumulator("qc2_text_passes")
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val nCorpus = corpus.count()
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    Curation.cleanedSignals(corpus.filter(tick()), ev,
      Curation.Params(), phashBits = 32).count()
    assert(passes.value == nCorpus,
      s"corpus text scanned ${passes.value.toDouble / nCorpus}x with phash — must be once")

    out.unpersist(); admitted.unpersist()
  }

  test("qc3 admits through the native GroupTopK — no per-cell window funnel") {
    // cells are few by construction, so a row_number window over cell
    // would funnel each cell's whole population through one task; the
    // native operator pre-reduces map-side (≤ cap rows per partition
    // per cell cross the exchange) and no WindowExec may plan at all
    val q = Curation.qc3_semantic_balance(spark, "/root/testdata/sf0.01")
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("GroupTopK"),
      "qc3 must rank through the native GroupTopK operator")
    assert(!explained.linesIterator.exists(_.matches("""\(\d+\) Window.*""")),
      "qc3 must not plan a window operator")
    // and the cap genuinely binds on the fixture: every cell admits
    // exactly the cap while holding more candidates
    val rows = q.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_admitted") == 8L &&
        r.getAs[Long]("n_vectors") > 8L,
        s"cap not binding on ${r}")
    }
  }

  test("curateToShards: two text scans total, shards hold exactly the admitted set, reproducible") {
    val passes = spark.sparkContext.longAccumulator("shard_text_passes")
    val raw = Tables.documents(spark, d)
    val nRaw = raw.count()
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val docs = raw.filter(tick())
    val ev = raw.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val dir1 = java.nio.file.Files.createTempDirectory("curate_shards1").toString
    Curation.curateToShards(docs, ev, dir1, nShards = 4)
    // pass 1 = the signal scan, pass 2 = the shard writer landing the
    // payload — the floor for a pipeline that drops text early
    assert(passes.value == 2 * nRaw,
      s"corpus text scanned ${passes.value.toDouble / nRaw}x — must be exactly twice")
    val landed = spark.read.parquet(s"$dir1/shards")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val admitted = Curation.curate(raw, ev).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(landed == admitted, "shards must hold exactly the admitted docs")
    // reproducible: a second run lands an identical manifest
    val dir2 = java.nio.file.Files.createTempDirectory("curate_shards2").toString
    Curation.curateToShards(raw, ev, dir2, nShards = 4)
    def man(dir: String) = spark.read.parquet(s"$dir/manifest")
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(man(dir1) == man(dir2), "manifest must be reproducible")
  }

  test("qc6 selection path: one signal scan, histogram ≡ exploded grouping, " +
    "admitted = greedy budget prefix, shards land it in two scans") {
    val raw = Tables.documents(spark, d)
    val corpus = raw.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val ev = raw.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val p = Curation.Params(qualityCanonical = true,
      importanceBudget = Some(Curation.SelectionTokenBudget))

    // the importance signal must ride pass 1: admitted() still reads
    // the corpus text exactly once
    val passes = spark.sparkContext.longAccumulator("qc6_text_passes")
    val nCorpus = corpus.count()
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val out = Curation.admitted(corpus.filter(tick()), ev, p).collect()
    assert(out.nonEmpty)
    assert(passes.value == nCorpus,
      s"corpus text scanned ${passes.value.toDouble / nCorpus}x — must be exactly once")

    // the row-local RLE histogram is EXACTLY the grouped exploded tokens
    val hist = corpus
      .withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
      .select(col("doc_id"), explode(expr(batch.TextOps.BucketHistogramExpr)).as("b"))
      .select(col("doc_id"), col("b.bucket").as("bucket"), col("b.c").as("c"))
    val grouped = corpus.select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), t -> length(t) > 0)")).as("tok"))
      .groupBy(col("doc_id"), batch.TextOps.bucketOf(col("tok")).as("bucket"))
      .agg(count(lit(1)).as("c"))
    assert(hist.except(grouped).isEmpty && grouped.except(hist).isEmpty,
      "RLE bucket histogram diverged from the exploded grouping")

    // the admitted set is the greedy token-budget prefix in
    // (importance DESC, doc_id) order — scores recomputed INDEPENDENTLY
    // from raw text via importanceScoresOf over the clean survivors
    val clean = Curation.cleanedSignals(corpus, ev, p, phashBits = 0)
    val scores = batch.TextOps.importanceScoresOf(
        corpus.join(clean.select("doc_id"), Seq("doc_id")), "en")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("importance"), r.getAs[Long]("n_tok")))
      .sortBy { case (id, imp, _) => (-imp, id) }
    var cum = 0L
    val expect = scores.iterator.map { case (id, _, tok) => cum += tok; (id, cum) }
      .takeWhile(_._2 <= Curation.SelectionTokenBudget).map(_._1).toSeq.sorted
    val got = out.map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(got == expect, "admitted set is not the greedy budget prefix")
    assert(expect.size < scores.length, "the budget must BIND on the fixture")

    // and curateToShards lands exactly this set within the two-scan
    // discipline
    val passes2 = spark.sparkContext.longAccumulator("qc6_shard_passes")
    val tick2 = udf(() => { passes2.add(1); true }).asNondeterministic()
    val dir = java.nio.file.Files.createTempDirectory("curate_shards_sel").toString
    Curation.curateToShards(corpus.filter(tick2()), ev, dir, nShards = 4, p)
    assert(passes2.value == 2 * nCorpus,
      s"corpus text scanned ${passes2.value.toDouble / nCorpus}x — must be exactly twice")
    val landed = spark.read.parquet(s"$dir/shards")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(landed == expect, "shards must hold exactly the selected docs")
  }

  test("bloom decontam regime admits the identical set, without broadcasting eval fps") {
    val docs = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val ev = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val base = Curation.admitted(docs, ev, Curation.Params())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val bloomed = Curation.admitted(docs, ev, Curation.Params(bloomDecontam = true))
    val bloomedIds = bloomed.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(bloomedIds === base, "the bloom pass is a plan optimization, not a semantics change")
    assert(base.nonEmpty)
    // the decontam stage runs inside cleanedSignals' eager checkpoint,
    // so the final plan starts from an ExistingRDD and can't show the
    // bloom filter — its plan shape (map-side prune, non-broadcast
    // verify join) is pinned on the same code path by BloomSpec/qd12
  }

  test("qc2 embedding membrane: one-cell flood stays cap-bounded (O(cap²), not O(N²))") {
    // 2000 near-identical vectors: every one lands in the same top-2
    // probe cells and every pair has cosine ≈ 1 — the degenerate corpus
    // qd13's CellCap exists for, driven through qc2's OWN seam
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
    val n = 2000
    val dim = 8
    val rows = (0 until n).map { i =>
      Row(i.toLong, Array.tabulate(dim)(j => 1.0f + (if (j == 0) i * 1e-6f else 0f)))
    }
    val emb = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      .withColumn("nrm",
        sqrt(expr("aggregate(embedding, 0d, (a, x) -> a + double(x) * double(x))")))
      .localCheckpoint()
    val cents = emb.filter(pmod(col("doc_id"), lit(100)) === 7)
      .select(col("doc_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val nPairs = Curation.embedCandidatePairs(emb, cents).count()
    val capBound = Dedup.CellCap.toLong * (Dedup.CellCap - 1) / 2
    assert(nPairs <= Dedup.ProbeCells * capBound,
      s"degenerate cell must stay cap-bounded: $nPairs pairs vs bound ${Dedup.ProbeCells * capBound}")
    assert(nPairs < n.toLong * (n - 1) / 4, "must be far below the uncapped pair space")
  }

  test("lmModelDir gates admission against the FROZEN persisted model, and " +
    "matches the hand-composed gate exactly") {
    import graft.batch.TextOps
    // sf0.01, not the suite's sf0.001: the 2-bits-per-bigram line is
    // data-dependent, and the tiny fixture's bigram counts are so
    // sparse that EVERY doc falls under it (an all-empty gate would
    // make the equivalence check vacuous)
    val docs = Tables.spread(Tables.documents(spark, "/root/testdata/sf0.01"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    // qc9's reference shape: the doc_id % 5 slice as the model corpus
    val dir = java.nio.file.Files.createTempDirectory("lm_gate").toString
    TextOps.saveLm(spark, dir,
      TextOps.lmTrain(corpus.filter(pmod(col("doc_id"), lit(5)) === 0)))
    val open = Curation.admitted(corpus, ev, Curation.Params())
      .select("doc_id").as[Long].collect().toSet
    val gated = Curation.admitted(corpus, ev,
        Curation.Params(lmModelDir = Some(dir)))
      .select("doc_id").as[Long].collect().toSet
    assert(gated.subsetOf(open), "the gate can only DROP docs")
    assert(gated.size < open.size, "the narrow reference must bind")
    assert(gated.nonEmpty, "some docs must clear the 2-bit line at sf0.01")
    // hand-composed equivalence through the public seams
    val clean = Curation.cleanedSignals(corpus, ev, Curation.Params(), 0)
    val lowLm = TextOps.lmScoreDocs(
        corpus.select(col("doc_id"), col("source"), col("text"))
          .join(clean.select(col("doc_id")), Seq("doc_id")),
        TextOps.loadLm(spark, dir))
      .filter(col("score") < lit(2) * col("n_bg")).select(col("doc_id"))
    val byHand = Curation.mixtureAdmit(
        clean.join(lowLm, Seq("doc_id"), "left_anti"), Curation.Params())
      .select("doc_id").as[Long].collect().toSet
    assert(gated == byHand)
    // the source-keyed reference exemption (lmRefSource): exempted
    // docs pass the gate by definition — every open-admitted doc of
    // that source survives, and non-exempt docs gate exactly as before
    val refSource = corpus.select("source").orderBy("source").head().getString(0)
    val exempted = Curation.admitted(corpus, ev,
        Curation.Params(lmModelDir = Some(dir), lmRefSource = Some(refSource)))
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val openSrc = Curation.admitted(corpus, ev, Curation.Params())
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val openRef = openSrc.filter(_._2 == refSource).keySet
    assert(openRef.subsetOf(exempted.map(_._1).toSet),
      "an exempted-source doc must never be gated out")
    assert(exempted.filter(_._2 != refSource).map(_._1).toSet ==
      gated.filter(id => openSrc.get(id).exists(_ != refSource)),
      "non-exempt docs must gate exactly as without the exemption")
  }

  test("curate admission is deterministic across runs") {
    val docs = Tables.documents(spark, d)
    val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    def admittedIds = Curation.curate(docs, ev).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(admittedIds == admittedIds, "two runs must admit identical doc sets")
  }

  test("qualityCanonical displaces a band-dedup keep off the min id (qc5 vs qc1)") {
    // two docs share their first 120 chars — identical shingle prefix,
    // so identical MinHash bands (a constructed near-dup pair) — and
    // diverge after: doc 1 adds no stopwords (quality 0), doc 2 adds
    // five (quality > 0). Under qc1's min-id rule doc 1 keeps; under
    // qc5's (quality DESC, id ASC) argmax doc 2 MUST displace it. A
    // third unrelated doc pins that untouched docs ride through both
    // modes identically.
    val prefix = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega").take(140)
    val docs = Seq(
      (1L, "s", prefix + " mountain river forest stone cliff meadow"),
      (2L, "s", prefix + " the apple and pear of plum a grape to peach"),
      (5L, "s", "completely unrelated third document about maritime navigation " +
        "charts compass sextant harbor lighthouse voyage")).toDF("doc_id", "source", "text")
    val ev = Seq((99L, "disjoint eval sentence with zero shared windows whatsoever " +
      "nothing here overlaps the corpus fixtures")).toDF("doc_id", "text")
    def admits(p: Curation.Params) =
      Curation.admitted(docs, ev, p).select("doc_id").as[Long].collect().toSet
    val minId = admits(Curation.Params())
    val quality = admits(Curation.Params(qualityCanonical = true))
    assert(minId.contains(1L) && !minId.contains(2L),
      s"min-id rule must keep doc 1: $minId")
    assert(quality.contains(2L) && !quality.contains(1L),
      s"quality rule must displace the keep to doc 2: $quality")
    assert(minId.contains(5L) && quality.contains(5L),
      "the unrelated doc must survive both modes")
  }
}
