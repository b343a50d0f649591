package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.batch.{IvfIndex, Similarity}

class IvfIndexSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
  private lazy val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
  private lazy val dir = {
    val d = Files.createTempDirectory("ivf").toString
    IvfIndex.build(emb, d, nCells = 16)
    d
  }

  test("probing all cells is exact: equals brute-force knnTopK") {
    val full = IvfIndex.search(spark, dir, queries, k = 3, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(emb, queries.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == brute)
  }

  test("nProbe=4 keeps high recall at a fraction of the candidates") {
    val approx = IvfIndex.search(spark, dir, queries, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(emb, queries.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 $recall too low for 4/16 cells")
  }

  test("the cells scan carries partition filters on cell — probes open directories, not the corpus") {
    val res = IvfIndex.search(spark, dir, queries, k = 3, nProbe = 2)
    val scans = collectWithSubqueries(res.queryExecution.executedPlan) {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.head.toString.contains("cells") => s
    }
    assert(scans.nonEmpty, "no cells scan found")
    // the probe join key is the hive partition column, so the physical
    // scan must treat cell as partition metadata (join-pruned at
    // runtime), never as data read from every file
    assert(scans.head.relation.partitionSchema.fieldNames.contains("cell"),
      s"cells table not partitioned by cell: ${scans.head.relation.partitionSchema}")
    res.queryExecution.toRdd.count() // executes fine end-to-end
  }

  test("incremental append: half-built index + appended half ≡ full index for search") {
    val d = Files.createTempDirectory("ivf_inc").toString
    val first = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    IvfIndex.build(first, d, nCells = 16)
    IvfIndex.appendBatch(spark, d, rest)
    // probing all cells over the appended index = brute force over the
    // FULL corpus (appended vectors are immediately searchable)
    val got = IvfIndex.search(spark, d, queries, k = 3, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(emb, queries.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("native nearest_cells ≡ HOF topCells/bestCell over the whole corpus, both rounding modes") {
    // the native probe must reproduce the HOF fold id-for-id — same
    // rounding (BigDecimal HALF_UP at 6 dp), same (rcos DESC, cid ASC)
    // order, same −1 sentinel at p = 1 — on every fixture vector
    val cents = IvfIndex.sampleCentroids(
      emb.withColumn("nrm", sqrt(graft.functions.GraftFunctions.vec_dot(
        col("embedding"), col("embedding")))), 23)
    val nm = emb
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.vec_dot(
        col("embedding"), col("embedding"))))
      .crossJoin(broadcast(IvfIndex.centroidArray(cents)))
    for (rounded <- Seq(true, false); p <- Seq(1, 3, 5)) {
      val diff = nm.select(
          IvfIndex.nearestCells(col("embedding"), col("nrm"), p, rounded).as("native"),
          transform(IvfIndex.topCells(col("embedding"), col("nrm"), p, rounded),
            c => c.getField("cid")).as("hof"))
        .filter(!(col("native").cast("string") <=> col("hof").cast("string")))
      assert(diff.count() === 0L, s"rounded=$rounded p=$p: ${diff.take(2).mkString(",")}")
    }
    val bc = nm.select(
        IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true).as("native"),
        IvfIndex.bestCellHof(col("embedding"), col("nrm"), rounded = true).as("hof"))
      .filter(!(col("native") <=> col("hof")))
    assert(bc.count() === 0L)
    // empty quantizer: bestCell keeps the −1 sentinel
    val empty = IvfIndex.centroidArray(cents.filter(lit(false)))
    val sentinel = emb.limit(1)
      .withColumn("nrm", sqrt(graft.functions.GraftFunctions.vec_dot(
        col("embedding"), col("embedding"))))
      .crossJoin(broadcast(empty))
      .select(IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true))
      .head.getLong(0)
    assert(sentinel === -1L)
  }

  test("multi-assignment (assign=2): all-cell probe still exact, duplicates deduped, append follows meta") {
    val d = Files.createTempDirectory("ivf_q2").toString
    IvfIndex.build(emb, d, nCells = 16, assign = 2)
    // every vector now lives in exactly 2 cells…
    val cells = spark.read.parquet(s"$d/cells")
    assert(cells.count() === 2 * emb.count())
    assert(cells.groupBy("vec_id").count().filter(col("count") =!= 2).count() === 0L)
    // …and probing all cells is STILL exact brute force: the search-side
    // dedupe collapses a vector reached through both its homes, so k
    // ranks hold k distinct neighbors
    val got = IvfIndex.search(spark, d, queries, k = 3, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(emb, queries.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
    // appends adopt the persisted multiplicity without the caller
    // re-stating it (meta.json carries assign)
    val d2 = Files.createTempDirectory("ivf_q2_inc").toString
    IvfIndex.build(emb.filter(pmod(col("vec_id"), lit(2)) === 0), d2, nCells = 16, assign = 2)
    IvfIndex.appendBatch(spark, d2, emb.filter(pmod(col("vec_id"), lit(2)) === 1))
    assert(spark.read.parquet(s"$d2/cells").count() === 2 * emb.count())
  }

  test("bestCell fold ≡ crossJoin+window assignment over the whole sf0.01 corpus") {
    // the row-local argmax fold replaced a row_number window at seven
    // sites; this pins the two forms bit-identical on real data so the
    // refactor can never silently drift the cell layout
    val cents = spark.read.parquet(s"$dir/centroids")
    val nm = emb.withColumn("nrm",
      sqrt(graft.functions.GraftFunctions.vec_dot(col("embedding"), col("embedding"))))
    val fold = nm.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
      .withColumn("cell", IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true))
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("crcos").desc, col("cid").asc)
    val window = nm.crossJoin(broadcast(cents))
      .withColumn("crcos", round(
        graft.functions.GraftFunctions.vec_dot(col("ce"), col("embedding")) / (col("cn") * col("nrm")), 6))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fold == window)
  }

  test("exact cosine ties break to the smallest cid, in bestCell and in topCells order") {
    import spark.implicits._
    // two centroids share one embedding → identical cosine against any
    // query; the window's ORDER BY cosine DESC, cid ASC picks cid 2, so
    // the fold (first-minimum over the cid-sorted array) must too
    val cents = Seq(
      (7L, Array(1f, 0f), 1d), (2L, Array(1f, 0f), 1d), (9L, Array(0f, 1f), 1d))
      .toDF("cid", "ce", "cn")
    val q = Seq((1L, Array(1f, 0f), 1d)).toDF("vec_id", "embedding", "nrm")
    val got = q.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
      .select(IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true).as("cell"),
        IvfIndex.topCells(col("embedding"), col("nrm"), 3, rounded = true).as("pcs"))
      .collect().head
    assert(got.getLong(0) == 2L)
    val probeOrder = got.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
    assert(probeOrder == Seq(2L, 7L, 9L), s"probe order $probeOrder")
  }

  test("a round()-produced −0.0 cannot steal a tie from +0.0 (oracle zero semantics)") {
    import spark.implicits._
    // centroid 5's dot is −1e-9 → round(…,6) = −0.0; centroid 8's is
    // exactly 0.0. DuckDB's ORDER BY treats them equal (tie → cid), and
    // the fold normalizes both to +0.0 to match; a raw Spark window
    // would rank −0.0 below +0.0 and pick 8 — the drift this pins out
    val cents = Seq(
      (5L, Array(-1e-9f, 1f), 1d), (8L, Array(0f, 1f), 1d))
      .toDF("cid", "ce", "cn")
    val q = Seq((1L, Array(1f, 0f), 1d)).toDF("vec_id", "embedding", "nrm")
    val cell = q.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
      .select(IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true).as("cell"))
      .collect().head.getLong(0)
    assert(cell == 5L, s"expected cid 5 (smaller id on a 0-tie), got $cell")
  }

  test("search plans no window and no per-vector exchange on the probe side") {
    // probe selection is a row-local fold over one broadcast quantizer
    // row: a WindowExec (or an exchange keyed by qid/vec_id before the
    // candidate join) would mean the N×C explosion came back
    val res = IvfIndex.search(spark, dir, queries, k = 3, nProbe = 2)
    val explained = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val winLines = explained.linesIterator.filter(_.matches("""\(\d+\) Window.*""")).toSeq
    // the only legitimate window is GroupTopK's final per-qid rank over
    // ≤ k·partitions pre-reduced rows — none over raw probe/cell rows
    assert(winLines.isEmpty || explained.contains("GroupTopK"),
      s"unexpected window operators: $winLines")
    val lines = explained.linesIterator.toVector
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => i
    }.foreach { i =>
      val input = lines.drop(i).take(3).find(_.trim.startsWith("Input")).getOrElse("")
      assert(!input.contains("qe"),
        s"raw query-vector rows entered a shuffle: $input")
    }
  }

  test("malformed centroids are excluded from probes in BOTH paths (no partial-dot mis-rank)") {
    import spark.implicits._
    // cid 3 has the wrong dimensionality, cid 4 a null element — in the
    // HOF path VectorDotExpr scores them null→NaN and topCells filters
    // them; the native path must EXCLUDE them too, not dot over the
    // common prefix and hand bad metadata a silently-partial score
    // (round-11 ADVICE). cid 9 is orthogonal (worst well-formed score)
    // and must still outrank both malformed entries.
    val cents = Seq(
      (1L, Array(Option(1f), Option(0f)), 1d),
      (9L, Array(Option(0f), Option(1f)), 1d),
      (3L, Array(Option(1f)), 1d),
      (4L, Array(Option(1f), Option.empty[Float]), 1d))
      .toDF("cid", "ce", "cn")
    val q = Seq((1L, Array(1f, 0f), 1d)).toDF("vec_id", "embedding", "nrm")
    val base = q.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
    for (rounded <- Seq(true, false)) {
      val row = base.select(
        IvfIndex.nearestCells(col("embedding"), col("nrm"), 4, rounded).as("native"),
        transform(IvfIndex.topCells(col("embedding"), col("nrm"), 4, rounded),
          c => c.getField("cid")).as("hof"),
        IvfIndex.bestCellHof(col("embedding"), col("nrm"), rounded).as("bh"),
        IvfIndex.bestCell(col("embedding"), col("nrm"), rounded).as("bn"))
        .collect().head
      assert(row.getSeq[Long](0) == Seq(1L, 9L), s"native ${row.getSeq[Long](0)}")
      assert(row.getSeq[Long](1) == Seq(1L, 9L), s"hof ${row.getSeq[Long](1)}")
      assert(row.getLong(2) == 1L && row.getLong(3) == 1L)
    }
    // every centroid malformed → empty probe list, −1 sentinel in both
    val allBad = q.crossJoin(broadcast(IvfIndex.centroidArray(
      cents.filter(col("cid").isin(3L, 4L)))))
      .select(IvfIndex.nearestCells(col("embedding"), col("nrm"), 2, rounded = true).as("n"),
        IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true).as("bn"),
        IvfIndex.bestCellHof(col("embedding"), col("nrm"), rounded = true).as("bh"))
      .collect().head
    assert(allBad.getSeq[Long](0).isEmpty)
    assert(allBad.getLong(1) == -1L && allBad.getLong(2) == -1L)
  }

  test("a dir without meta.json fails loudly instead of defaulting to single-assignment") {
    // build always writes meta.json; its absence means the layout is
    // not ours (or a partial write) — a silent assign=1 default would
    // disable the q=2 search dedupe and corrupt appends (round-11
    // ADVICE)
    val d = Files.createTempDirectory("ivf_nometa").toString
    IvfIndex.build(emb.limit(200), d, nCells = 4, assign = 2)
    Files.delete(java.nio.file.Paths.get(s"$d/meta.json"))
    val ex = intercept[IllegalStateException] {
      IvfIndex.search(spark, d, queries.limit(2), k = 2, nProbe = 2).collect()
    }
    assert(ex.getMessage.contains("meta.json"))
    val ex2 = intercept[IllegalStateException] {
      IvfIndex.appendBatch(spark, d, emb.limit(10))
    }
    assert(ex2.getMessage.contains("meta.json"))
  }

  test("rebuild picks identical centroids (content-addressed sampling)") {
    val d2 = Files.createTempDirectory("ivf2").toString
    IvfIndex.build(emb, d2, nCells = 16)
    val a = spark.read.parquet(s"$dir/centroids").select("cid").collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(s"$d2/centroids").select("cid").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  // -------------------- round-13: the aging answer (VERDICT r12 ask #1)

  private def searchSet(d: String, p: Int) =
    IvfIndex.search(spark, d, queries, k = 3, nProbe = p)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("rebuild ≡ fresh build: aged index re-celled in place matches a from-scratch index") {
    val aged = Files.createTempDirectory("ivf_aged").toString
    val first = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    IvfIndex.build(first, aged, nCells = 8) // undersized C for the full corpus
    IvfIndex.appendBatch(spark, aged, rest)
    IvfIndex.rebuild(spark, aged, corpus = emb) // auto-size C = ⌈√n⌉
    val fresh = Files.createTempDirectory("ivf_fresh").toString
    val c = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    IvfIndex.build(emb, fresh, nCells = c)
    // identical quantizer (content-addressed sample at the same C) ⇒
    // identical layout ⇒ identical search at any probe width. The
    // rebuilt layout lives in generation-suffixed dirs — resolve them
    val ca = spark.read.parquet(IvfIndex.centroidsPath(spark, aged)).select("cid")
      .collect().map(_.getLong(0)).sorted
    val cf = spark.read.parquet(IvfIndex.centroidsPath(spark, fresh)).select("cid")
      .collect().map(_.getLong(0)).sorted
    assert(ca.sameElements(cf), "rebuild must pick the fresh build's centroids")
    assert(searchSet(aged, 4) == searchSet(fresh, 4))
    // the meta is versioned and re-annotated
    val meta = IvfIndex.metaOf(spark, aged)
    assert(meta.ver == 2 && meta.nCells == c && meta.rows == emb.count(), meta.toString)
  }

  test("rebuild preserves the layout contract: an int8 q=2 index stays int8 q=2") {
    val d = Files.createTempDirectory("ivf_i8_rb").toString
    IvfIndex.build(emb.limit(400), d, nCells = 8, assign = 2, int8 = true)
    IvfIndex.rebuild(spark, d, corpus = emb.limit(400), nCells = 8)
    val meta = IvfIndex.metaOf(spark, d)
    assert(meta.assign == 2 && meta.quant == "int8" && meta.ver == 2, meta.toString)
    assert(spark.read.parquet(IvfIndex.cellsPath(spark, d)).columns.sorted.toSeq ==
      Seq("cell", "nrm", "q8", "scale", "vec_id"))
  }

  test("crash between rebuild commit and install: next entry finishes it; uncommitted snapshots are discarded") {
    val d = Files.createTempDirectory("ivf_crash").toString
    IvfIndex.build(emb.limit(400), d, nCells = 4)
    // committed snapshot, install never ran (the crash window)
    IvfIndex.writeRebuildSnapshot(spark, d, emb.limit(400), nCells = 8,
      IvfIndex.metaOf(spark, d))
    assert(IvfIndex.metaOf(spark, d).nCells == 4, "live layout untouched pre-install")
    // any entry point recovers: search installs the snapshot first
    IvfIndex.search(spark, d, queries.limit(2), k = 2, nProbe = 2).collect()
    val meta = IvfIndex.metaOf(spark, d)
    assert(meta.nCells == 8 && meta.ver == 2, meta.toString)
    assert(!new java.io.File(s"$d/.rebuild_tmp").exists)
    // an UNCOMMITTED snapshot (no marker — crash mid-write) is discarded
    val tmp = new java.io.File(s"$d/.rebuild_tmp/centroids")
    tmp.mkdirs()
    IvfIndex.search(spark, d, queries.limit(2), k = 2, nProbe = 2).collect()
    assert(!new java.io.File(s"$d/.rebuild_tmp").exists, "partial snapshot must be discarded")
    assert(IvfIndex.metaOf(spark, d).ver == 2, "discard must not touch the live layout")
  }

  // ------------------- round-13: filtered search (attrs in the index)

  /** Exact filtered top-k reference: corpus side filtered, query side
    * NOT (a filtered search answers "nearest MATCHING neighbor of any
    * query") — [[Similarity.knnTopK]] can't state this because it
    * derives query vectors from the same frame it scores. Same
    * rounding/tie rules as the engine. */
  private def bruteFiltered(pred: org.apache.spark.sql.Column, k: Int) = {
    val nm = emb.withColumn("nrm", sqrt(graft.functions.GraftFunctions.vec_dot(
      col("embedding"), col("embedding"))))
    val q = nm.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val cand = nm.filter(pred).crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(graft.functions.GraftFunctions.vec_dot(
        col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
      .select(col("qid").cast("long"), col("vec_id").cast("long"),
        col("rcos").cast("double"))
    graft.plans.GroupTopK.topK(cand, keys = Seq("qid"),
      order = Seq(col("rcos").desc, col("vec_id").asc), k = k)
      .select(col("qid"), col("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("filtered search: all-cell probe ≡ brute force over the filtered corpus, k fully ranked") {
    val d = Files.createTempDirectory("ivf_attr").toString
    val c = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    IvfIndex.build(emb, d, c, assign = 2, attrs = Seq("label"))
    val got = IvfIndex.search(spark, d, queries, k = 3, nProbe = c,
      where = Some(col("label") === 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == bruteFiltered(col("label") === 3, 3))
    // every query fills all 3 ranks from matching vectors (pre-ranking
    // filter, never post-filter under-fill): ~10% of 500 ≫ 3
    val perQ = got.groupBy(_._1).view.mapValues(_.size)
    assert(perQ.values.forall(_ == 3), s"underfilled ranks: $perQ")
    // meta records the attr so appends are schema-checked
    assert(IvfIndex.metaOf(spark, d).attrs == Seq("label"))
  }

  test("low-selectivity routing: brute path ≡ probe path exactly, engages only below the derived floor") {
    val d = Files.createTempDirectory("ivf_route").toString
    val c = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    IvfIndex.build(emb, d, c, assign = 2, attrs = Seq("label"))
    val pred = col("label") === 3
    def run(hint: Option[Double], p: Int) =
      IvfIndex.search(spark, d, queries, k = 3, nProbe = p,
        where = Some(pred), selectivityHint = hint)
    // floor = p·q/C; a hint below it routes to brute force, which must
    // equal the EXACT all-cell probe result row for row (both are
    // exact over the filter, same tie-break)
    val brute = run(Some(1e-4), 2)
    assert(brute.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      == bruteFiltered(pred, 3))
    // the brute plan has NO probe stage; the probe plan does
    def hasProbe(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.toString.contains("nearest_cells")
    assert(!hasProbe(brute), "hint below floor must skip the probe stage")
    assert(hasProbe(run(Some(0.9), 2)), "hint above floor must keep probes")
    // NO hint: since round 15 the index derives the estimate itself
    // from its recorded attr stats (label = 3 is ~10% of the fixture,
    // below this p=2 floor of 2·2/23) — auto-routes to brute, result
    // identical to the exact filtered top-k
    val auto = run(None, 2)
    assert(!hasProbe(auto), "derivable attr-equality below the floor must auto-route")
    assert(auto.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      == bruteFiltered(pred, 3))
    // a non-attr predicate stays underivable → probes (the old default)
    assert(hasProbe(IvfIndex.search(spark, d, queries, k = 3, nProbe = 2,
      where = Some(pmod(col("vec_id"), lit(100)) === 3))),
      "underivable predicates without a hint must keep probes")
    // and the routed search is still rank-complete
    val perQ = brute.collect().groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ == 3))
  }

  test("attr stats: the derived estimate matches the measured fraction; " +
    "conjunctions multiply; unrecorded values and non-equality derive honestly") {
    val d = Files.createTempDirectory("ivf_stats").toString
    IvfIndex.build(emb, d, nCells = 8, attrs = Seq("label"))
    val meta = IvfIndex.metaOf(spark, d)
    val st = meta.attrStats("label")
    val n = emb.count()
    assert(st.rows == n)
    assert(st.distinct == emb.select("label").distinct().count())
    // label cardinality is far below the top-K cap, so every value is
    // recorded exactly and the estimate IS the measured fraction
    val measured = emb.filter(col("label") === 3).count().toDouble / n
    assert(IvfIndex.deriveSelectivity(col("label") === 3, meta).contains(measured))
    assert(IvfIndex.deriveSelectivity(lit(3) === col("label"), meta).contains(measured))
    // conjunction multiplies (independence), both sides derivable
    val m5 = emb.filter(col("label") === 5).count().toDouble / n
    assert(IvfIndex.deriveSelectivity(
      col("label") === 3 && col("label") === 5, meta).contains(measured * m5))
    // a value the index never held: every distinct value is recorded,
    // so the honest estimate is zero
    assert(IvfIndex.deriveSelectivity(col("label") === 424242, meta).contains(0.0))
    // underivable shapes: ranges, ORs, non-attr columns
    assert(IvfIndex.deriveSelectivity(col("label") > 3, meta).isEmpty)
    assert(IvfIndex.deriveSelectivity(
      col("label") === 3 || col("label") === 5, meta).isEmpty)
    assert(IvfIndex.deriveSelectivity(col("vec_id") === 3, meta).isEmpty)
    // auto-routed search ≡ the same search with the measured hint
    val auto = IvfIndex.search(spark, d, queries, k = 3, nProbe = 2,
      where = Some(col("label") === 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val hinted = IvfIndex.search(spark, d, queries, k = 3, nProbe = 2,
      where = Some(col("label") === 3), selectivityHint = Some(measured))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(auto == hinted)
    // a stats-free layout (no attrs) derives nothing and keeps probes
    val d2 = Files.createTempDirectory("ivf_nostats").toString
    IvfIndex.build(emb, d2, nCells = 8)
    assert(IvfIndex.metaOf(spark, d2).attrStats.isEmpty)
  }

  test("filtered search pushes the attr predicate into the cells scan") {
    val d = Files.createTempDirectory("ivf_attr_push").toString
    IvfIndex.build(emb, d, nCells = 8, attrs = Seq("label"))
    val res = IvfIndex.search(spark, d, queries, k = 3, nProbe = 2,
      where = Some(col("label") === 3))
    val scans = collectWithSubqueries(res.queryExecution.executedPlan) {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.head.toString.contains("cells") => s
    }
    assert(scans.nonEmpty, "no cells scan found")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("label"), s"label filter not pushed: $pushed")
    res.queryExecution.toRdd.count()
  }

  test("append into an attr-indexed layout: attrs required, then searchable; int8 carries attrs too") {
    val d = Files.createTempDirectory("ivf_attr_inc").toString
    val first = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    IvfIndex.build(first, d, nCells = 8, attrs = Seq("label"))
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.appendBatch(spark, d, rest.drop("label"))
    }
    assert(ex.getMessage.contains("label"))
    IvfIndex.appendBatch(spark, d, rest)
    val got = IvfIndex.search(spark, d, queries, k = 3, nProbe = 8,
      where = Some(col("label") === 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == bruteFiltered(col("label") === 3, 3))
    // int8 layout carries the attr through quantization and rebuild
    val d8 = Files.createTempDirectory("ivf_attr_i8").toString
    IvfIndex.build(emb.limit(400), d8, nCells = 8, assign = 2, int8 = true,
      attrs = Seq("label"))
    assert(spark.read.parquet(s"$d8/cells").columns.contains("label"))
    IvfIndex.rebuild(spark, d8, corpus = emb.limit(400), nCells = 8)
    val meta = IvfIndex.metaOf(spark, d8)
    assert(meta.attrs == Seq("label") && meta.quant == "int8" && meta.ver == 2)
    assert(spark.read.parquet(IvfIndex.cellsPath(spark, d8)).columns.contains("label"))
    val exR = intercept[IllegalArgumentException] {
      IvfIndex.rebuild(spark, d8, corpus = emb.limit(400).drop("label"), nCells = 8)
    }
    assert(exR.getMessage.contains("label"))
  }

  test("rebuilds install into new generations; the replaced one survives a full cycle (reader grace)") {
    val d = Files.createTempDirectory("ivf_gen").toString
    val corpus = emb.filter(col("vec_id") < 300) // deterministic subset
    IvfIndex.build(corpus, d, nCells = 4)
    // a reader that resolved gen-0 paths BEFORE the rebuild…
    val preRebuildCells = spark.read.parquet(s"$d/cells")
    IvfIndex.rebuild(spark, d, corpus, nCells = 6)
    val m1 = IvfIndex.metaOf(spark, d)
    assert(m1.gen == 1 && m1.nCells == 6, m1.toString)
    assert(new java.io.File(s"$d/cells_g1").isDirectory)
    // …still reads its generation intact mid-flight (grace period)
    assert(new java.io.File(s"$d/cells").isDirectory, "replaced gen must survive one cycle")
    assert(preRebuildCells.count() > 0)
    // the NEXT rebuild retires gen 0 and keeps gen 1
    IvfIndex.rebuild(spark, d, corpus, nCells = 8)
    val m2 = IvfIndex.metaOf(spark, d)
    assert(m2.gen == 2 && m2.ver == 3, m2.toString)
    assert(!new java.io.File(s"$d/cells").exists, "gen 0 retired at gen 2")
    assert(!new java.io.File(s"$d/centroids").exists)
    assert(new java.io.File(s"$d/cells_g1").isDirectory, "gen 1 keeps its grace")
    // search resolves the current generation and stays exact (queries
    // restricted to corpus members — knnTopK derives query vectors
    // from the same frame it scores)
    val qs = corpus.filter(pmod(col("vec_id"), lit(100)) === 0)
    val got = IvfIndex.search(spark, d, qs, k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(corpus, qs.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("build() DISCARDS a crashed rebuild's committed snapshot instead of letting it roll the build back") {
    val d = Files.createTempDirectory("ivf_zombie").toString
    IvfIndex.build(emb.limit(200), d, nCells = 4)
    // committed snapshot at nCells=8, never installed (the crash)
    IvfIndex.writeRebuildSnapshot(spark, d, emb.limit(200), nCells = 8,
      IvfIndex.metaOf(spark, d))
    // operator remediates with a fresh build at nCells=5
    IvfIndex.build(emb.limit(200), d, nCells = 5)
    assert(!new java.io.File(s"$d/.rebuild_tmp").exists,
      "build must discard the snapshot (committed or not)")
    // no later entry point may resurrect the pre-crash snapshot
    IvfIndex.search(spark, d, queries.limit(2), k = 2, nProbe = 2).collect()
    val meta = IvfIndex.metaOf(spark, d)
    assert(meta.nCells == 5 && meta.ver == 2 && meta.gen == 1, meta.toString)
  }

  test("build over a LIVE layout installs into the next generation — readers keep their grace") {
    val d = Files.createTempDirectory("ivf_rebuildgrace").toString
    val corpus = emb.filter(col("vec_id") < 300)
    IvfIndex.build(corpus, d, nCells = 4)
    // a reader resolves gen-0 paths…
    val preCells = spark.read.parquet(s"$d/cells")
    // …then a re-build replaces the layout: it must land BESIDE gen 0,
    // not delete it first (the old in-place overwrite stranded every
    // lazy reader for the duration of the build job)
    IvfIndex.build(corpus, d, nCells = 6)
    val m = IvfIndex.metaOf(spark, d)
    assert(m.gen == 1 && m.ver == 2 && m.nCells == 6, m.toString)
    assert(new java.io.File(s"$d/cells").isDirectory, "gen 0 keeps its grace")
    assert(preCells.count() > 0, "pre-build reader must finish unharmed")
    // a third build retires gen 0 (one-cycle grace) and serves gen 2
    IvfIndex.build(corpus, d, nCells = 8)
    assert(!new java.io.File(s"$d/cells").exists, "gen 0 retired at gen 2")
    assert(new java.io.File(s"$d/cells_g1").isDirectory)
    val qs = corpus.filter(pmod(col("vec_id"), lit(100)) === 0)
    val got = IvfIndex.search(spark, d, qs, k = 3, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.knnTopK(corpus, qs.select("vec_id"), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
  }

  test("a fully-filtering where yields an empty result, not a full-corpus rescore scan") {
    val d = Files.createTempDirectory("ivf_allfilter").toString
    IvfIndex.build(emb, d, nCells = 8, int8 = true, attrs = Seq("label"))
    val res = IvfIndex.searchInt8(spark, d, queries, emb, k = 3, nProbe = 8,
      rescore = 10, where = Some(col("label") === 999)) // matches nothing
    assert(res.count() === 0L)
  }

  test("rebuildIfGrown: cadence fires at the growth factor, not before") {
    val d = Files.createTempDirectory("ivf_grow").toString
    val half = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    IvfIndex.build(half, d, nCells = 8)
    // no growth yet → no rebuild (and the default occupancy check
    // stays quiet on an ordinary md5-sampled layout — skew ≈ 1.x)
    assert(!IvfIndex.rebuildIfGrown(spark, d, half, factor = 2.0))
    assert(IvfIndex.metaOf(spark, d).ver == 1)
    // doubling the layout crosses factor 2 → rebuild runs, auto-sized
    IvfIndex.appendBatch(spark, d, emb.filter(pmod(col("vec_id"), lit(2)) === 1))
    assert(IvfIndex.rebuildIfGrown(spark, d, emb, factor = 2.0))
    val meta = IvfIndex.metaOf(spark, d)
    assert(meta.ver == 2 &&
      meta.nCells == math.ceil(math.sqrt(emb.count().toDouble)).toInt, meta.toString)
  }

  test("rebuildIfGrown: occupancy skew fires the rebuild where growth " +
    "alone would not (round-15 verdict #5)") {
    val d = Files.createTempDirectory("ivf_skew").toString
    IvfIndex.build(emb, d, nCells = 8)
    // drift burst: 2n/3 new vectors that are all COPIES of one corpus
    // embedding — identical vectors assign to one frozen cell, so the
    // layout grows only 1.67× (under the growth factor) while the hot
    // cell's occupancy diverges — requantizeIfSkewed's collapsed-drift
    // regime, on the serving index
    val n = emb.count()
    val donor = emb.orderBy("vec_id").limit(1).select(col("embedding"))
    val hot = spark.range(2 * n / 3).crossJoin(donor)
      .select((col("id") + lit(10000000L)).as("vec_id"), col("embedding"))
    IvfIndex.appendBatch(spark, d, hot)
    val corpusNow = emb.select(col("vec_id"), col("embedding")).unionByName(hot)
    // skew check disabled → growth alone says "not due"
    assert(!IvfIndex.rebuildIfGrown(spark, d, corpusNow, factor = 2.0,
      skewFactor = 0))
    assert(IvfIndex.metaOf(spark, d).ver == 1)
    // hottest cell ≥ 3 × mean occupancy → the occupancy trigger fires
    assert(IvfIndex.rebuildIfGrown(spark, d, corpusNow, factor = 2.0))
    val meta = IvfIndex.metaOf(spark, d)
    assert(meta.ver == 2 &&
      meta.nCells == math.ceil(math.sqrt(corpusNow.count().toDouble)).toInt,
      meta.toString)
    // NOTE deliberately NOT asserted quiet post-rebuild: this batch is
    // IDENTICAL vectors, which no re-celling can split (equal points
    // share a cell under any quantizer) — deduplicating such floods is
    // the exact-dedup membrane's job upstream (qd1/EmbedIngest's
    // in-batch rule), not the index's. A DISTINCT-vector drift blob
    // re-balances on rebuild (AnnScaleBench's driftcost measurement).
  }

  test("stale attr stats keep the probe route: an appended layout past the " +
    "stale factor must not brute-route on frequencies it no longer has " +
    "(round-15 verdict #7)") {
    val d = Files.createTempDirectory("ivf_stale").toString
    val c = math.ceil(math.sqrt(emb.count().toDouble)).toInt
    IvfIndex.build(emb, d, c, assign = 2, attrs = Seq("label"))
    def run(hint: Option[Double] = None) =
      IvfIndex.search(spark, d, queries, k = 3, nProbe = 2,
        where = Some(col("label") === 3), selectivityHint = hint)
    def hasProbe(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.toString.contains("nearest_cells")
    assert(!hasProbe(run()), "fresh stats below the floor auto-route to brute")
    // append 2/3 of the corpus again under new ids: the layout now
    // holds ≥ 1.5 × the stats' recorded rows — past the stale default
    val extra = emb.filter(pmod(col("vec_id"), lit(3)) =!= 0)
      .withColumn("vec_id", col("vec_id") + lit(10000000L))
    IvfIndex.appendBatch(spark, d, extra)
    assert(hasProbe(run()),
      "stale stats must not flip the route — probes are the honest default")
    // a caller hint is the caller's own claim and bypasses the gate
    assert(!hasProbe(run(Some(1e-4))))
    // the rebuild refreshes the stats → the auto-route re-engages
    IvfIndex.rebuild(spark, d, emb.unionByName(extra))
    assert(!hasProbe(run()), "refreshed stats must re-enable the auto-route")
  }
}
