package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput of the dedup-at-ingest path (stream.IngestDedup): N
  * synthetic docs in B-sized batches, each batch exact- and
  * near-dup-filtered against the accumulating corpus index.
  *
  * Synthetic corpus with known duplicate structure, per group of 5 ids:
  * one base doc, one exact dup (same text), one near dup (same
  * 120-char shingle window, different tail), two uniques → the
  * converged corpus keeps 3/5 of docs (base kept, exact dup dropped,
  * near dup dropped, both uniques kept).
  *
  * Env: GRAFT_INGEST_DOCS (default 100000), GRAFT_INGEST_BATCHES (10),
  * GRAFT_INGEST_MODE: `default` runs the production regime switches as
  * configured; `regimes` runs the SAME workload three times against a
  * fresh store, forcing each probe regime (trickle IN-pushdown /
  * broadcast / shuffle) via the `spark.graft.ingest.*` limit confs, and
  * prints per-regime docs/sec in one JSON line — the boundary numbers
  * BASELINE.md records.
  * Prints one JSON line with docs/sec and the dedup ratio achieved.
  */
object IngestBench {

  /** Locale-safe numeric JSON fragment — the f"" interpolator formats
    * with the JVM default locale, so "%.1f" under a comma-decimal
    * locale would break the driver's JSON parse. */
  private def jd(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  /** JSON string escape (Verify's q(): quote, backslash, control
    * chars) — a corpus token interpolated raw could carry any of them. */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_INGEST_DOCS", "100000").toLong
    val nBatches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "10").toInt
    val mode = sys.env.getOrElse("GRAFT_INGEST_MODE", "default")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    // deterministic text: 30 group-seeded tokens (shared shingle window)
    // + per-variant tail
    def toks(seed: Column, n: Int, salt: String): Column =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        i => substring(md5(concat(seed, lit(s"|$salt|"), i.cast("string"))), 1, 4)))
    val g = col("id") / 5
    val grp = g.cast("long").cast("string")
    val variant = pmod(col("id"), lit(5))
    val docs = spark.range(nDocs).toDF("id")
      .withColumn("text",
        when(variant === 0, toks(grp, 30, "base"))
        .when(variant === 1, toks(grp, 30, "base"))                             // exact dup of 0
        .when(variant === 2, concat(toks(grp, 30, "base"), lit(" "), toks(grp, 4, "tail"))) // near dup
        .otherwise(toks(concat(grp, variant.cast("string")), 30, "uniq")))
      .withColumnRenamed("id", "doc_id")

    val batchSize = math.max(1L, nDocs / nBatches)
    def ingestAll(toDir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        // last batch takes the division remainder so every doc ingests
        val hi = if (b == nBatches - 1) nDocs else (b + 1) * batchSize
        stream.IngestDedup.ingestBatch(
          docs.filter(col("doc_id") >= b * batchSize && col("doc_id") < hi),
          toDir, epochId = b)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, spark.read.parquet(s"$toDir/corpus").count())
    }

    if (mode == "multimodal") {
      // docs carry text AND a 16-dim embedding; per group of 5 ids:
      // v0 base (admitted), v1 exact-text dup, v2 near-text dup,
      // v3 unique text but BYTE-IDENTICAL embedding to v0 (the
      // embedding membrane's reject), v4 unique both → kept = 2/5.
      // Components are SIGNED (zero-centered): positive-only random
      // vectors all point into one orthant and cosine-collide.
      val dim = 16
      def emb(seed: Column): Column =
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((conv(substring(md5(concat(seed, lit("|e|"), i.cast("string"))), 1, 4), 16, 10)
            .cast("double") - 32768.0) / 32768.0).cast("float"))
      val gMm = (col("doc_id") / 5).cast("long").cast("string")
      val vMm = pmod(col("doc_id"), lit(5))
      // GRAFT_INGEST_MEDIA=1 adds the third membrane: v4 (unique text
      // AND embedding, so it reaches the media stage) carries a
      // 320-char payload whose phash is exactly bit (group % 8) — the 8
      // distinct hashes are pairwise Hamming distance 2 ≤ radius 3, so
      // across the whole run exactly ONE v4 survives (the globally
      // first, doc_id 4) and every other v4 is a media rejection;
      // all other variants are unhashable (pass unfiltered). Keeps the
      // kept-count provable: nDocs/5 (v0) + 1.
      val withMedia = sys.env.get("GRAFT_INGEST_MEDIA").contains("1")
      val mmDocs0 = docs.withColumn("embedding",
        when(vMm === 0 || vMm === 3, emb(gMm))
          .otherwise(emb(concat(gMm, lit("#"), col("doc_id").cast("string")))))
      val mmDocs = if (!withMedia) mmDocs0 else mmDocs0.withColumn("media", expr(
        "CASE WHEN pmod(doc_id, 5) = 4 THEN concat(" +
          "repeat('a', cast(pmod(doc_id div 5, 8) as int) * 10), repeat('z', 10), " +
          "repeat('a', (31 - cast(pmod(doc_id div 5, 8) as int)) * 10)) " +
          "ELSE 'x' END"))
      val mmDir = s"$dir/mm"
      val cents = spark.range(8).toDF("cid")
        .withColumn("ce", emb(concat(lit("cent"), col("cid").cast("string"))))
        .withColumn("cn", sqrt(graft.functions.GraftFunctions.vec_dot(col("ce"), col("ce"))))
      stream.MultimodalIngest.init(spark, mmDir, cents)
      // GRAFT_INGEST_REQUANT=N re-quantizes every N epochs mid-run (the
      // drift-handling cadence `start()` wires), so the bench records
      // what a requantize tick costs under load and whether ingest
      // throughput recovers after the rebuild. 0 = off.
      val requantEvery = sys.env.getOrElse("GRAFT_INGEST_REQUANT", "0").toInt
      // GRAFT_INGEST_STATS=1 adds the corpus-statistics membrane
      // (per-epoch MG + HLL + totals over each batch's ADMITTED docs)
      // so the bench records what live corpus observability costs
      val statsOn = sys.env.get("GRAFT_INGEST_STATS").contains("1")
      // GRAFT_INGEST_COMPACT=N folds every store's accumulated epoch
      // partitions every N epochs — the production cadence `start()`
      // wires (compactEvery = 64 there), so a long bench run measures
      // ingest WITH the accretion countermeasure on, not the
      // ever-growing epoch-dir listing the 200k-doc r9 run showed
      // degrading throughput. 0 = off (the r9 configuration).
      val compactEvery = sys.env.getOrElse("GRAFT_INGEST_COMPACT", "0").toInt
      var compactSecs = 0.0
      var compactions = 0
      var tickSecs = 0.0
      var ticks = 0
      var lastTick = -1
      var statsSecs = 0.0
      val batchSecs = Array.ofDim[Double](nBatches)
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        if (compactEvery > 0 && b > 0 && b % compactEvery == 0) {
          val tc = System.nanoTime()
          stream.MultimodalIngest.compact(spark, mmDir, upTo = b)
          compactSecs += (System.nanoTime() - tc) / 1e9
          compactions += 1
        }
        if (requantEvery > 0 && b > 0 && b % requantEvery == 0) {
          val tt = System.nanoTime()
          // auto-sized (0): C = max(current, ⌈√corpus⌉) per tick — the
          // √N rule; a pinned C makes per-batch probe cost grow
          // linearly with the corpus (the 1M-doc run's quartile slide)
          stream.MultimodalIngest.requantize(spark, mmDir, nCells = 0, upTo = b)
          tickSecs += (System.nanoTime() - tt) / 1e9
          ticks += 1
          lastTick = b
        }
        val tb = System.nanoTime()
        val hi = if (b == nBatches - 1) nDocs else (b + 1) * batchSize
        stream.MultimodalIngest.ingestBatch(
          mmDocs.filter(col("doc_id") >= b * batchSize && col("doc_id") < hi),
          mmDir, epochId = b, tau = 0.99)
        if (statsOn) {
          val ts = System.nanoTime()
          stream.MultimodalIngest.foldStats(spark, mmDir, b)
          statsSecs += (System.nanoTime() - ts) / 1e9
        }
        batchSecs(b) = (System.nanoTime() - tb) / 1e9
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val kept = stream.MultimodalIngest.corpus(spark, mmDir).count()
      val expectedKept = if (withMedia) nDocs / 5 + 1 else nDocs * 2 / 5

      // the composed per-doc ledger must roll up to EXACTLY the known
      // cluster structure, at bench scale: every group of 5 forms one
      // size-4 cluster rooted at v0 (text-exact v1, text-near v2 and
      // embed-dup v3 all resolve there — three membranes, one root),
      // and the v4s are nGroups singletons without media or ONE
      // nGroups-sized perceptual cluster rooted at doc 4 with it.
      val tCl0 = System.nanoTime()
      val cl = stream.MultimodalIngest.clusters(spark, mmDir)
        .groupBy(col("cluster_size")).agg(
          countDistinct(col("cluster_id")).as("n_clusters"),
          count(lit(1)).as("n_members"))
        .collect().map(r => r.getAs[Long]("cluster_size") ->
          (r.getAs[Long]("n_clusters"), r.getAs[Long]("n_members"))).toMap
      val clSecs = (System.nanoTime() - tCl0) / 1e9
      val nGroups = nDocs / 5
      require(cl.values.map(_._2).sum == nDocs,
        s"cluster membership ${cl.values.map(_._2).sum} != ingested $nDocs")
      require(cl.get(4L).exists(_._1 == nGroups),
        s"expected $nGroups size-4 clusters, got ${cl.get(4L)}")
      if (withMedia)
        require(cl.get(nGroups).exists(_._1 == 1L),
          s"expected one size-$nGroups media cluster, got ${cl.get(nGroups)}")
      else
        require(cl.get(1L).exists(_._1 == nGroups),
          s"expected $nGroups singletons, got ${cl.get(1L)}")
      val nMediaRej = stream.MultimodalIngest.metrics(spark, mmDir)
        .agg(sum(col("n_media_rejected"))).collect()(0).getLong(0)
      // throughput over the batches AFTER the last requantize tick —
      // proves the rebuilt cell layout probes as fast as the original
      val postSecs = batchSecs.drop(math.max(lastTick, 0)).sum
      val postDocs = (nBatches - math.max(lastTick, 0)) * batchSize
      val postRate = if (lastTick < 0 || postSecs == 0) nDocs / secs else postDocs / postSecs
      val statsJson = if (!statsOn) "" else {
        // sanity: the membrane's totals must equal the corpus exactly
        val (mg, agg) = stream.CorpusStats.summary(spark, s"$mmDir/stats", upTo = nBatches)
        val t = agg.collect()(0)
        require(t.getAs[Long]("n_docs") == kept,
          s"stats n_docs ${t.getAs[Long]("n_docs")} != corpus $kept")
        // headOption: a stats-on run whose admitted docs have no tokens
        // leaves the merged MG sketch empty — (0) would throw here
        val topTok = mg.limit(1).collect().headOption.map(_.getString(0)).getOrElse("")
        s""","stats_secs":${jd(statsSecs, 1)},"stats_docs":${t.getAs[Long]("n_docs")},"stats_est_distinct":${t.getAs[Long]("est_distinct_content")},"stats_top_tok":${jq(topTok)}"""
      }
      // flat-cost evidence: per-quartile ingest rate over the batch
      // sequence (compaction/requant/stats ticks excluded — batchSecs
      // times only ingestBatch) — a healthy cadence keeps Q4 within
      // noise of Q1 instead of the monotone accretion slide
      val quartileRates = (0 until 4).map { qi =>
        val loB = nBatches * qi / 4
        val hiB = if (qi == 3) nBatches else nBatches * (qi + 1) / 4
        val qSecs = (loB until hiB).map(batchSecs).sum
        val qDocs = (if (qi == 3) nDocs else hiB * batchSize) - loB * batchSize
        if (qSecs == 0) 0.0 else qDocs / qSecs
      }
      println(s"""{"metric":"multimodal_ingest_docs_per_sec","value":${jd(nDocs / secs, 1)},"docs":$nDocs,"batches":$nBatches,"kept":$kept,"expected_kept":$expectedKept,"media":${if (withMedia) 1 else 0},"media_rejected":$nMediaRej,"secs":${jd(secs, 1)},"cluster_secs":${jd(clSecs, 1)},"n_clusters":${cl.values.map(_._1).sum},"q_docs_per_sec":[${quartileRates.map(jd(_, 1)).mkString(",")}],"compact_every":$compactEvery,"compactions":$compactions,"compact_secs_per_tick":${jd(if (compactions == 0) 0.0 else compactSecs / compactions, 2)},"requant_every":$requantEvery,"requant_ticks":$ticks,"requant_secs_per_tick":${jd(if (ticks == 0) 0.0 else tickSecs / ticks, 2)},"post_requant_docs_per_sec":${jd(postRate, 1)}$statsJson}""")
    } else if (mode == "regimes") {
      // force each probe regime over the identical workload; the limits
      // are read per batch, so setting them before a run is enough
      val forced = Seq(
        ("trickle", Map("spark.graft.ingest.isinKeyLimit" -> Long.MaxValue.toString,
                        "spark.graft.ingest.broadcastKeyLimit" -> Long.MaxValue.toString)),
        ("broadcast", Map("spark.graft.ingest.isinKeyLimit" -> "0",
                          "spark.graft.ingest.broadcastKeyLimit" -> Long.MaxValue.toString)),
        ("shuffle", Map("spark.graft.ingest.isinKeyLimit" -> "0",
                        "spark.graft.ingest.broadcastKeyLimit" -> "0")))
      val rates = forced.map { case (name, confs) =>
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val (secs, kept) = ingestAll(s"$dir/$name")
        require(kept == nDocs * 3 / 5, s"$name regime kept $kept, expected ${nDocs * 3 / 5}")
        s""""$name":${jd(nDocs / secs, 1)}"""
      }
      println(s"""{"metric":"ingest_regime_docs_per_sec",${rates.mkString(",")},"docs":$nDocs,"batches":$nBatches}""")
    } else {
      val (secs, kept) = ingestAll(dir)
      println(s"""{"metric":"ingest_docs_per_sec","value":${jd(nDocs / secs, 1)},"docs":$nDocs,"batches":$nBatches,"kept":$kept,"expected_kept":${nDocs * 3 / 5},"secs":${jd(secs, 1)}}""")
    }
    spark.stop()
  }
}
