package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.batch.Quality

/** Quality.observed must count rows and nulls in the SAME pass as the
  * consuming action — batch via Observation.get, streaming via
  * observedMetrics on the progress. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("lmScoreOf: the reference slice is a caller predicate — a source-" +
    "membership reference scores every OTHER source, and the id-residue " +
    "instantiation is exactly qt20") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.01"
    val docs = Tables.spread(Tables.documents(spark, d))
    val refSource = docs.select("source").orderBy("source").head().getString(0)
    val bySource = graft.batch.TextOps.lmScoreOf(docs, col("source") === refSource)
      .collect().map(_.getString(0))
    assert(bySource.nonEmpty && !bySource.contains(refSource),
      s"the reference source must not be scored: ${bySource.take(3).mkString(",")}")
    val viaSeam = graft.batch.TextOps
      .lmScoreOf(docs, pmod(col("doc_id"), lit(5)) === 0).collect().toSeq
    val viaQuery = graft.batch.TextOps.qt20_lm_score(spark, d).collect().toSeq
    assert(viaSeam == viaQuery)
  }

  test("persisted LM model: saveLm/loadLm round-trips, and a FROZEN model " +
    "scores a new slice identically to in-query training (round-15 #2)") {
    import graft.batch.TextOps
    val d = "/root/testdata/sf0.001"
    val docs = Tables.spread(Tables.documents(spark, d))
    val isRef = pmod(col("doc_id"), lit(5)) === 0
    val model = TextOps.lmTrain(docs.filter(isRef))
    val dir = java.nio.file.Files.createTempDirectory("lm_model").toString
    TextOps.saveLm(spark, dir, model)
    val loaded = TextOps.loadLm(spark, dir)
    // the persisted table IS the model, row for row
    assert(loaded.orderBy("bg").collect().toSeq ==
      model.select(col("bg"), col("c").cast("long")).orderBy("bg").collect().toSeq)
    // a "new corpus version": a different slice of the fixture, scored
    // once against the frozen artifact and once against the in-query
    // model — identical per-doc scores (the production path never
    // re-trains per version)
    val newSlice = docs.filter(!isRef && pmod(col("doc_id"), lit(3)) === 1)
    val viaFrozen = TextOps.lmScoreDocs(newSlice, loaded)
      .orderBy("doc_id").collect().toSeq
    val viaInQuery = TextOps.lmScoreDocs(newSlice, model)
      .orderBy("doc_id").collect().toSeq
    assert(viaFrozen == viaInQuery && viaFrozen.nonEmpty)
    // and the per-doc seam reproduces qt20's rollup exactly: rolling
    // lmScoreDocs up per source equals the oracle-gated query
    val viaSeam = TextOps.lmScoreDocs(docs.filter(!isRef), model)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("score")).as("sum_score"),
        sum(col("n_bg")).as("sum_bigrams"),
        sum(when(col("score") < lit(2) * col("n_bg"), 1L).otherwise(0L)).as("n_low_lm"))
      .orderBy("source").collect().toSeq
    assert(viaSeam == TextOps.qt20_lm_score(spark, d).collect().toSeq)
  }

  test("batch observation: row count and null counts ride along") {
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), null), (None, null))
      .toDF("v", "s")
    val obs = Observation("q")
    val observed = Quality.observed(df, obs, "v", "s")
    assert(observed.count() === 4)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_v") === 2L)
    assert(m("n_null_s") === 2L)
  }

  test("rank quality: OOV tokens score K+1 and the integer report matches by hand") {
    import spark.implicits._
    // k = 2: vocabulary is the two most frequent terms (ties by term
    // asc); everything else is out-of-vocabulary at rank 3
    val docs = Seq(
      ("a", "the the cat"), //  the=1 (x2), cat: freq 1 → vocab? k=2:
      ("a", "the dog zzz"), //  counts: the=3, cat=1, dog=1, zzz=1 →
      ("b", "qqq qqq")      //  qqq=2 → vocab = [the(3), qqq(2)]
    ).toDF("source", "text")
    val out = graft.batch.TextOps.rankQuality(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    // source a: doc1 toks [the,the,cat] → ranks 1+1+3=5, oov 1
    //           doc2 toks [the,dog,zzz] → ranks 1+3+3=7, oov 2
    //           → n_docs 2, sum_tok 6, sum_rank 12, sum_oov 3, 12*100 div 6 = 200
    // source b: [qqq,qqq] → 2+2=4, oov 0 → 1, 2, 4, 0, 200
    assert(out == List(("a", 2L, 6L, 12L, 3L, 200L), ("b", 1L, 2L, 4L, 0L, 200L)))
  }

  test("rank quality plans: the scoring pass shuffles no doc rows") {
    // pass 1 exchanges term-cardinality count rows, the report
    // exchanges source-cardinality aggregates; the fold itself is
    // row-local, so NO exchange may carry doc text or token arrays
    val q = graft.batch.TextOps.qt13_rank_quality(spark, "/root/testdata/sf0.001")
    val explained = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val lines = explained.linesIterator.toVector
    lines.zipWithIndex.collect {
      case (l, i) if l.matches("""\(\d+\) Exchange.*""") => i
    }.foreach { i =>
      val input = lines.drop(i).take(3).find(_.trim.startsWith("Input")).getOrElse("")
      assert(!input.contains("toks") && !input.contains("text"),
        s"doc-level rows entered a shuffle: $input")
    }
  }

  test("streaming observation: per-batch metrics in query progress") {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val observed = Quality.observed(
      in.toDF().toDF("v", "s").withColumn("s", when($"s" === "x", null).otherwise($"s")),
      "ingest_quality", "s")
    val q = observed.writeStream.format("noop").start()
    try {
      in.addData((1L, "x"), (2L, "y"), (3L, "x"))
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest_quality"))).lastOption
      assert(metrics.isDefined, "no observed metrics in progress")
      assert(metrics.get.getAs[Long]("n_rows") === 3L)
      assert(metrics.get.getAs[Long]("n_null_s") === 2L)
    } finally q.stop()
  }

  test("temperature mixture: head share shrinks, tail grows, admission is partition-stable") {
    // head: 90 docs x 10 tok = 900; tail: 10 docs x 10 tok = 100.
    // w_sqrt = 30 / 10, grand_w = 40. budget 400:
    //   head rate = 400*30e6 div (40*900) = 333333 ppm (~1/3)
    //   tail rate = 400*10e6 div (40*100) = 1e6 → capped: admit ALL
    val toks = spark.range(100)
      .selectExpr("id AS doc_id",
        "IF(id < 90, 'head', 'tail') AS source", "10L AS tok")
    val out = graft.batch.TextOps.temperatureMixture(toks, budget = 400L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val (headTot, headW, headShare, headRate, _, headSampled) = out("head")
    val (tailTot, tailW, _, tailRate, tailN, tailSampled) = out("tail")
    assert((headTot, headW, headShare, headRate) === ((900L, 30L, 900L, 333333L)))
    assert((tailTot, tailW, tailRate) === ((100L, 10L, 1000000L)))
    assert((tailN, tailSampled) === ((10L, 100L))) // capped rate admits all
    // the point of the temperature: head's share of the SAMPLE is
    // strictly below its 90% share of the corpus, tail's strictly above
    val total = headSampled + tailSampled
    assert(headSampled * 1000 / total < headShare)
    assert(tailSampled * 1000 / total > 100L)
    // md5-keyed admission: a doc's fate is independent of partitioning
    val re = graft.batch.TextOps.temperatureMixture(toks.repartition(7), budget = 400L)
    assert(re.collect().toSeq === graft.batch.TextOps
      .temperatureMixture(toks, budget = 400L).collect().toSeq)
  }
}
