package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.stream.IngestDedup

/** Dedup-at-ingest: exact + near-dup filtering of arriving batches
  * against the accumulating corpus index (the streaming qd1/qd2).
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  // 30 distinct 3-char tokens ≈ 119 chars — fills the 120-char shingle
  // window, so any text sharing this prefix has the identical shingle
  // set (→ identical minhash signature) regardless of its tail
  private val prefix = (0 until 30).map(i => f"w$i%02d").mkString(" ")
  private val base = prefix + " tail one"
  private val exactDup = prefix + " tail one"        // same md5
  private val nearDup = prefix + " tail two differs" // same shingles, new md5
  private val other = (0 until 30).map(i => f"z$i%02d").mkString(" ")

  test("batch 1 in-batch dedup; batch 2 deduped against the corpus index") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    input.addData((1L, base), (2L, exactDup), (3L, nearDup), (4L, other))
    val q = IngestDedup.start(docs, s"$dir/out", s"$dir/ckpt", Trigger.AvailableNow())
    assert(q.awaitTermination(120000))

    def corpusIds = spark.read.parquet(s"$dir/out/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpusIds == Seq(1L, 4L),
      "in-batch: exact dup (2) and near dup (3) lose to min doc_id 1")

    // second batch: everything dups against the CORPUS except the new doc
    input.addData((5L, base), (6L, nearDup),
      (7L, (0 until 30).map(i => f"y$i%02d").mkString(" ")))
    val q2 = IngestDedup.start(docs, s"$dir/out", s"$dir/ckpt", Trigger.AvailableNow())
    assert(q2.awaitTermination(120000))
    assert(corpusIds == Seq(1L, 4L, 7L),
      "cross-batch: 5 exact-dups and 6 near-dups the indexed corpus; 7 is new")

    // indexes grew only by the survivors
    assert(spark.read.parquet(s"$dir/out/exact_idx").count() == 3)
    assert(spark.read.parquet(s"$dir/out/band_idx").count() == 6) // 2 bands × 3 docs
  }

  test("row-local bandKeys ≡ aggregate minhash bands on the fixture corpus") {
    // the ingest index probe is only sound if the streaming (row-local)
    // and batch (explode+groupBy) signature paths agree exactly
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val viaAgg = graft.batch.Dedup.minhashSigs(spark, d)
      .select(col("doc_id"),
        md5(concat(col("h0"), col("h1"), col("h2"))).as("b0"),
        md5(concat(col("h3"), col("h4"), col("h5"))).as("b1"))
    val viaRow = Tables.documents(spark, d)
      .select(col("doc_id"), graft.batch.Dedup.bandKeys(col("text")).as("bands"))
      .select(col("doc_id"),
        col("bands")(0).getField("key").as("b0"),
        col("bands")(1).getField("key").as("b1"))
      .filter(col("b0").isNotNull) // all-empty docs have no aggregate row
    assert(viaRow.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaRow).isEmpty,
      "row-local and aggregate band keys must be identical")
  }

  test("ingestBatch is the same code path for batch backfill") {
    val dir = Files.createTempDirectory("graft_ingest_b").toString
    IngestDedup.ingestBatch(
      Seq((10L, base), (11L, nearDup)).toDF("doc_id", "text"), s"$dir/out", epochId = 0)
    IngestDedup.ingestBatch(
      Seq((12L, base)).toDF("doc_id", "text"), s"$dir/out", epochId = 1)
    assert(spark.read.parquet(s"$dir/out/corpus")
      .select("doc_id").as[Long].collect().toSeq == Seq(10L))
  }

  test("replaying an epoch is idempotent: no duplicate corpus rows") {
    val dir = Files.createTempDirectory("graft_ingest_r").toString
    val b0 = Seq((20L, base), (21L, exactDup)).toDF("doc_id", "text")
    val b1 = Seq((22L, other)).toDF("doc_id", "text")
    IngestDedup.ingestBatch(b0, s"$dir/out", epochId = 0)
    IngestDedup.ingestBatch(b1, s"$dir/out", epochId = 1)
    // crash-replay of BOTH epochs (e.g. restart before checkpoint
    // commit): overwrite-into-epoch-partition + epoch<N probes converge
    // to the identical corpus instead of re-appending survivors
    IngestDedup.ingestBatch(b0, s"$dir/out", epochId = 0)
    IngestDedup.ingestBatch(b1, s"$dir/out", epochId = 1)
    assert(spark.read.parquet(s"$dir/out/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(20L, 22L))
    assert(spark.read.parquet(s"$dir/out/exact_idx").count() == 2)
  }
}
