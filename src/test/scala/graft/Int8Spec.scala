package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{IvfIndex, Similarity}
import graft.functions.GraftFunctions

/** Pins the int8 storage pair (Int8PackExpr / Int8DotExpr) against the
  * built-in Column composition they compress — qs6's quantization rule
  * — and the int8 IVF layout end to end. */
class Int8Spec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")

  private val scaleCol =
    expr("array_max(transform(embedding, v -> abs(cast(v as double)))) / 127")

  test("int8_pack+int8_dot == the transform/floor + aggregate(zip_with) composition, whole corpus") {
    // the composed form: q lists as bigints, dot as a fold — exactly
    // what the qs8 oracle states in DuckDB list lambdas
    val q = emb.withColumn("scale", scaleCol)
      .filter(col("scale") > 0)
      .withColumn("qv", expr(
        "transform(embedding, v -> cast(floor(cast(v as double) / scale + 0.5d) as bigint))"))
      .withColumn("q8", GraftFunctions.int8_pack(col("embedding"), col("scale")))
    // BinaryType has no element accessor — pin the packed bytes through
    // the dot: dot(v, v) native == Σ qv_i² composed (a wrong byte
    // anywhere breaks the square sum), and dot(v, w) on offset pairs
    // == the composed fold (a wrong byte breaks cross terms too)
    val self = q.withColumn("nat", GraftFunctions.int8_dot(col("q8"), col("q8")))
      .withColumn("cmp", expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .filter(col("nat") =!= col("cmp"))
    assert(self.count() === 0L)
    val pairs = q.select(col("vec_id").as("id_a"), col("q8").as("qa"), col("qv").as("va"))
      .join(q.select(col("vec_id").as("id_b"), col("q8").as("qb"), col("qv").as("vb")),
        col("id_b") === col("id_a") + 7)
      .withColumn("nat", GraftFunctions.int8_dot(col("qa"), col("qb")))
      .withColumn("cmp", expr("aggregate(zip_with(va, vb, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .filter(!(col("nat") <=> col("cmp")))
    assert(pairs.count() === 0L)
  }

  test("int8_pack/int8_dot interpreted evaluation == codegen evaluation") {
    // the vec_dot parity treatment: both execution paths of each
    // expression must agree bit-for-bit (incl. null results on the
    // malformed fixtures), since a store written under codegen is read
    // back under whatever path the consumer's plan compiles to
    val rnd = new scala.util.Random(12)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1))) :+
      ((Seq.fill(16)(0f), Seq.fill(16)(1f))) // zero vector → null pack
    val df = rows.toDF("a", "b")
      .withColumn("sa", expr("array_max(transform(a, v -> abs(cast(v as double)))) / 127"))
      .withColumn("sb", expr("array_max(transform(b, v -> abs(cast(v as double)))) / 127"))
    val out = df.select(
      GraftFunctions.int8_dot(
        GraftFunctions.int8_pack(col("a"), col("sa")),
        GraftFunctions.int8_pack(col("b"), col("sb"))).as("d"))
    def vals(frame: org.apache.spark.sql.DataFrame) =
      frame.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    // without this exclusion the LocalRelation fixture is folded by
    // ConvertToLocalRelation with an INTERPRETED projection in both
    // runs and the test would compare interpreted to interpreted —
    // doGenCode (the path the persisted store is written under) would
    // never execute
    val prevExcl = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      val codegen = vals(out)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = vals(out)
      assert(interpreted === codegen)
      assert(codegen.last.isEmpty, "zero-scale row must pack to null in both paths")
      assert(codegen.init.forall(_.nonEmpty))
    } finally {
      prevFactory match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      prevExcl match {
        case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
        case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
    }
  }

  test("|q| <= 127 for the max|x|/127 scale, and blob length == dims") {
    val q = emb.withColumn("scale", scaleCol).filter(col("scale") > 0)
      .select(GraftFunctions.int8_pack(col("embedding"), col("scale")).as("q8"),
        size(col("embedding")).as("d"))
    assert(q.filter(col("q8").isNull || length(col("q8")) =!= col("d")).count() === 0L)
  }

  test("malformed input nulls the pack/dot, never clamps or truncates") {
    val df = Seq((1L, Array(1f, -2f))).toDF("vec_id", "embedding")
    val bad = df.select(
      GraftFunctions.int8_pack(col("embedding"), lit(0d)).as("zero_scale"),
      GraftFunctions.int8_pack(col("embedding"), lit(-1d)).as("neg_scale"),
      GraftFunctions.int8_pack(col("embedding"), lit(Double.NaN)).as("nan_scale"),
      // scale far too small: q would overflow a signed byte
      GraftFunctions.int8_pack(col("embedding"), lit(1e-6)).as("overflow"),
      GraftFunctions.int8_dot(
        GraftFunctions.int8_pack(col("embedding"), lit(1d)),
        GraftFunctions.int8_pack(array(lit(1f)), lit(1d))).as("len_mismatch"),
      // q = −128 exactly: only reachable under a wrong caller-supplied
      // scale (|q| ≤ 127 holds by construction for max|x|/127), so it
      // nulls like every other malformed case — one outcome, not a
      // byte the dot would silently score (VERDICT r12 nit)
      GraftFunctions.int8_pack(array(lit(-128f), lit(1f)), lit(1d)).as("neg_128"))
      .collect().head
    (0 until 6).foreach(i => assert(bad.isNullAt(i), s"field $i should be null"))
    // null element in the vector
    val withNull = Seq((1L, Array(Option(1f), Option.empty[Float]))).toDF("vec_id", "embedding")
      .select(GraftFunctions.int8_pack(col("embedding"), lit(1d)))
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("int8 cells store NO float embedding, and the layout is self-describing") {
    val d = Files.createTempDirectory("ivf_i8").toString
    IvfIndex.build(emb, d, nCells = 16, assign = 2, int8 = true)
    val cells = spark.read.parquet(s"$d/cells")
    assert(cells.columns.sorted.toSeq == Seq("cell", "nrm", "q8", "scale", "vec_id"),
      cells.columns.mkString(","))
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$d/meta.json")))
    assert(meta.contains(""""quant":"int8""""), meta)
    // format mismatches fail loudly in BOTH directions
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val e1 = intercept[IllegalStateException] {
      IvfIndex.search(spark, d, qs, k = 3, nProbe = 2).collect()
    }
    assert(e1.getMessage.contains("searchInt8"), e1.getMessage)
    val df = Files.createTempDirectory("ivf_f32").toString
    IvfIndex.build(emb, df, nCells = 16)
    val e2 = intercept[IllegalStateException] {
      IvfIndex.searchInt8(spark, df, qs, emb, k = 3, nProbe = 2, rescore = 10).collect()
    }
    assert(e2.getMessage.contains("int8"), e2.getMessage)
  }

  test("searchInt8 with an all-candidates funnel == float search (rescore recovers exactness)") {
    // when rescore covers every candidate the int8 funnel drops nothing
    // and the float re-rank IS the float search's ranking — pinning
    // that the probe sets and the final scoring match the float path
    val d8 = Files.createTempDirectory("ivf_i8b").toString
    val df = Files.createTempDirectory("ivf_f32b").toString
    IvfIndex.build(emb, d8, nCells = 16, assign = 2, int8 = true)
    IvfIndex.build(emb, df, nCells = 16, assign = 2)
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val got = IvfIndex.searchInt8(spark, d8, qs, emb, k = 3, nProbe = 16,
        rescore = emb.count().toInt)
      .select("qid", "rank", "neighbor_id", "rcos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val want = IvfIndex.search(spark, df, qs, k = 3, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
  }

  test("filtered searchInt8 == filtered float search when the funnel covers all candidates") {
    // the attr predicate gates the int8 CANDIDATE scan, so with an
    // all-covering rescore the filtered int8 path must equal the
    // filtered float path exactly — pinning that `where` thins the
    // same pre-ranking set in both layouts (and that the float rescore
    // read can't resurrect a filtered-out vector: survivors come only
    // from filtered cells)
    val d8 = Files.createTempDirectory("ivf_i8w").toString
    val df = Files.createTempDirectory("ivf_f32w").toString
    IvfIndex.build(emb, d8, nCells = 16, assign = 2, int8 = true, attrs = Seq("label"))
    IvfIndex.build(emb, df, nCells = 16, assign = 2, attrs = Seq("label"))
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val pred = Some(col("label") === 3)
    val got = IvfIndex.searchInt8(spark, d8, qs, emb, k = 3, nProbe = 16,
        rescore = emb.count().toInt, where = pred)
      .select("qid", "rank", "neighbor_id", "rcos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val want = IvfIndex.search(spark, df, qs, k = 3, nProbe = 16, where = pred)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.size == 3))
  }

  test("searchInt8's cells scan treats cell as partition metadata (probes open directories)") {
    // same PartitionFilters contract IvfIndexSpec pins for the float
    // path: the 3x-smaller int8 cells carry ALL the per-query IO, so
    // losing the pruning would silently re-read the whole store
    val d = Files.createTempDirectory("ivf_i8p").toString
    IvfIndex.build(emb, d, nCells = 16, assign = 2, int8 = true)
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    // pin the candidate stage's plan — searchInt8's funnel is eagerly
    // checkpointed (bounded id collect + rescore join both consume
    // it), so the cells scan is not visible in the FINAL plan
    val (_, cand) = IvfIndex.int8Candidates(spark, d, qs, nProbe = 2)
    val scans = collectWithSubqueries(cand.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.head.toString.contains("cells") => s
    }
    assert(scans.nonEmpty, "no cells scan found")
    assert(scans.head.relation.partitionSchema.fieldNames.contains("cell"),
      s"int8 cells not partitioned by cell: ${scans.head.relation.partitionSchema}")
    // and the full search still executes end to end
    IvfIndex.searchInt8(spark, d, qs, emb, k = 3, nProbe = 2, rescore = 10)
      .queryExecution.toRdd.count()
  }

  test("appendBatch follows the persisted int8 format: incremental index ≡ full build for search") {
    // without the format check an append would mix float rows into the
    // quantized layout and corrupt every later search
    val full = Files.createTempDirectory("ivf_i8_full").toString
    val inc = Files.createTempDirectory("ivf_i8_inc").toString
    val first = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val rest = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    IvfIndex.build(emb, full, nCells = 16, assign = 2, int8 = true)
    IvfIndex.build(first, inc, nCells = 16, assign = 2, int8 = true)
    IvfIndex.appendBatch(spark, inc, rest)
    val appended = spark.read.parquet(s"$inc/cells")
    assert(appended.columns.sorted.toSeq == Seq("cell", "nrm", "q8", "scale", "vec_id"))
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    def run(d: String) =
      IvfIndex.searchInt8(spark, d, qs, emb, k = 3, nProbe = 16, rescore = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    // the two indexes sample different centroids (different build
    // corpus → different md5-ranked prefix), but an ALL-cell probe is
    // centroid-independent and int8 scores are index-independent, so
    // the appended index must search identically to the full build
    assert(run(inc) == run(full))
  }

  test("the int8 funnel at production width keeps the float top-k on the fixture corpus") {
    // RescoreCap ≳ 3k: a quantization reorder strictly inside the
    // funnel cannot change the emitted top-3 — measured here at the
    // fixture, at the rungs by AnnScaleBench's int8 arm
    val out = Similarity.qs8_int8_search(spark, "/root/testdata/sf0.01")
      .select("qid", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ref = Similarity.qs7_ivf_search(spark, "/root/testdata/sf0.01")
      .select("qid", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == ref, s"int8 funnel changed the top-3: ${(out diff ref) ++ (ref diff out)}")
  }
}
