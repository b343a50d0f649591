package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** The streaming corpus-statistics membrane: per-epoch MG + HLL + exact
  * totals, merged on read without corpus scans. */
class CorpusStatsSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 3),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def freshDir() = java.nio.file.Files.createTempDirectory("cstats").toString

  test("multi-epoch fold: heavy token surfaces, totals exact, HLL tracks distinct") {
    val dir = freshDir()
    // 3 epochs; "needle" is ~6% of every epoch's tokens (well above
    // N/257); the tail is epoch-unique singletons
    for (e <- 0L to 2L) {
      val rows = (1L to 50L).map { i =>
        (e * 100 + i, s"needle tail${e}_$i a$i b$i c$i d$i e$i f$i g$i h$i i$i j$i k$i l$i m$i n$i")
      }
      CorpusStats.fold(docs(rows), dir, e)
    }
    val (mg, agg) = CorpusStats.summary(spark, dir, upTo = 3L)
    val cands = mg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 150 docs x 16 tokens = 2400 tokens; needle = 150 > 2400/257
    assert(cands.contains("needle"), s"heavy token must survive the merge: $cands")
    assert(cands("needle") <= 150L, "merged count is a lower bound")
    assert(cands("needle") >= 150L - 2400L / (CorpusStats.Capacity + 1),
      "merged count within the mergeable-summaries error bound")
    val t = agg.collect().head
    assert(t.getAs[Long]("n_docs") === 150L)
    assert(t.getAs[Long]("n_tokens") === 2400L)
    val est = t.getAs[Long]("est_distinct_content")
    assert(math.abs(est - 150L) <= 150L * 0.05,
      s"HLL distinct-content estimate $est vs 150 exact")
  }

  test("replayed epoch overwrites its partition: exactly-once merge") {
    val dir = freshDir()
    val rows = (1L to 30L).map(i => (i, s"dup tok$i x$i y$i"))
    CorpusStats.fold(docs(rows), dir, 0L)
    val (mg1, agg1) = CorpusStats.summary(spark, dir, upTo = 1L)
    val before = mg1.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val docsBefore = agg1.collect().head.getAs[Long]("n_docs")
    // replay the SAME epoch (crash-recovery path)
    CorpusStats.fold(docs(rows), dir, 0L)
    val (mg2, agg2) = CorpusStats.summary(spark, dir, upTo = 1L)
    assert(mg2.collect().map(r => (r.getString(0), r.getLong(1))).toSet === before)
    assert(agg2.collect().head.getAs[Long]("n_docs") === docsBefore)
    assert(docsBefore === 30L, "no double counting")
  }

  test("composed with the ingest membrane: stats describe ADMITTED docs only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cstats_mm").toString + "/pipe"
    MultimodalIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    def uniq(tag: String) = (0 until 30).map(i => f"$tag%s$i%02d").mkString(" ")
    MultimodalIngest.ingestBatch(Seq(
      (1L, uniq("w") + " keepword", Seq(1f, 0f)),
      (2L, uniq("w") + " keepword", Seq(0f, 1f)),  // exact text dup → rejected
      (3L, uniq("y") + " keepword", Seq(0f, 1f))   // admitted
    ).toDF("doc_id", "text", "embedding"), dir, epochId = 0, tau = 0.99)
    MultimodalIngest.foldStats(spark, dir, 0L)
    val (mg, agg) = CorpusStats.summary(spark, s"$dir/stats", upTo = 1L)
    assert(agg.collect().head.getAs[Long]("n_docs") === 2L,
      "the rejected duplicate must not be counted")
    val kw = mg.filter(col("tok") === "keepword").collect()
    assert(kw.nonEmpty && kw.head.getLong(1) === 2L,
      "token counts come from the admitted corpus, not the raw batch")
  }

  test("summary respects the epoch visibility horizon (upTo)") {
    val dir = freshDir()
    CorpusStats.fold(docs(Seq((1L, "alpha one"))), dir, 0L)
    CorpusStats.fold(docs(Seq((2L, "beta two"))), dir, 1L)
    val (mg, agg) = CorpusStats.summary(spark, dir, upTo = 1L)
    val toks = mg.collect().map(_.getString(0)).toSet
    assert(toks.contains("alpha") && !toks.contains("beta"),
      "epoch 1 must be invisible below the horizon")
    assert(agg.collect().head.getAs[Long]("n_docs") === 1L)
  }
}
