package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{Shards, TextOps}

/** Training-shard output: reproducibility, integrity, balance, and
  * the zero-data-movement epoch re-shuffle. */
class ShardsSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"
  private val Cap = 2048L
  private val NShards = 4

  private def docs = Tables.documents(spark, d)
  private def binned = TextOps.docBins(
    docs.select(col("doc_id").cast("long"),
      size(split(col("text"), " ")).cast("long").as("tok")), Cap)

  test("write: every doc lands exactly once, sorted by (bin, doc_id) within its shard") {
    val dir = Files.createTempDirectory("shards").toString
    Shards.write(docs.select(col("doc_id").cast("long"), col("text")),
      binned, NShards, dir)
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    // within each shard the parquet row order is the (bin, doc_id)
    // stream a loader replays — check per shard via file read order
    (0 until NShards).foreach { sh =>
      val rows = spark.read.parquet(s"$dir/shards/shard=$sh")
        .select("bin", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == rows.sorted, s"shard $sh rows not in (bin, doc_id) order")
    }
  }

  test("manifest matches the written shards and two writes are identical") {
    val dir1 = Files.createTempDirectory("shards1").toString
    val dir2 = Files.createTempDirectory("shards2").toString
    val payload = docs.select(col("doc_id").cast("long"), col("text"))
    Shards.write(payload, binned, NShards, dir1)
    Shards.write(payload, binned, NShards, dir2)
    def man(dir: String) = spark.read.parquet(s"$dir/manifest")
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(man(dir1) == man(dir2), "manifest must be reproducible")
    // manifest ≡ what is actually on disk
    val fromDisk = spark.read.parquet(s"$dir1/shards")
      // the hive partition column reads back as int — normalize
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard").agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
        sum("doc_id").as("sum_doc_ids"))
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val fromManifest = man(dir1).map { case (sh, _, nd, nt, ck) => (sh, nd, nt, ck) }
    assert(fromDisk == fromManifest, "manifest diverges from written shards")
  }

  test("round-robin over prefix bins balances shard tokens to within ~one bin") {
    val m = TextOps.qt12_shard_manifest(spark, d).collect()
    assert(m.length == NShards)
    val toks = m.map(_.getAs[Long]("n_tokens"))
    // bins are cap-sized blocks of one global order, so shard totals
    // differ by at most one bin (+ the largest straddling doc)
    assert(toks.max - toks.min <= 2 * Cap,
      s"shards unbalanced: ${toks.mkString(",")}")
  }

  test("an interrupted write has no commit marker and readEpoch refuses it loudly") {
    val dir = Files.createTempDirectory("shards_crash").toString
    Shards.write(docs.select(col("doc_id").cast("long"), col("text")),
      binned, NShards, dir)
    // simulate the crash window: the marker drops FIRST on rewrite, so
    // an interrupted overwrite is exactly "files present, no marker"
    val marker = new java.io.File(dir, "_GRAFT_COMMIT")
    assert(marker.exists, "a finished write must leave the marker")
    assert(marker.delete())
    val e = intercept[IllegalArgumentException] {
      Shards.readEpoch(spark, dir, epoch = 0)
    }
    assert(e.getMessage.contains("commit marker"))
    // a re-run repairs: marker restored, reads succeed
    Shards.write(docs.select(col("doc_id").cast("long"), col("text")),
      binned, NShards, dir)
    assert(Shards.readEpoch(spark, dir, epoch = 0).count() == docs.count())
  }

  test("epochOrder is a deterministic permutation that varies by epoch") {
    val e0 = Shards.epochOrder(8, 0)
    assert(e0.sorted == (0 until 8), "must be a permutation")
    assert(e0 == Shards.epochOrder(8, 0), "must be deterministic")
    assert((0 until 4).map(Shards.epochOrder(8, _)).distinct.size > 1,
      "epochs must produce different orders")
  }

  test("readEpoch prunes to shard directories and streams the epoch order") {
    val dir = Files.createTempDirectory("shards_e").toString
    Shards.write(docs.select(col("doc_id").cast("long"), col("text")),
      binned, NShards, dir)
    val epoch = Shards.readEpoch(spark, dir, epoch = 1)
    assert(epoch.count() == docs.count())
    // the shard column must be hive partition metadata on each branch:
    // every scan prunes to one directory, no full-corpus read per shard
    val scans = collectWithSubqueries(epoch.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.relation.partitionSchema.fieldNames.contains("shard"),
        "shard must be a partition column")
      assert(s.partitionFilters.nonEmpty, "each epoch branch must prune by shard")
    }
    // first rows come from the epoch's first shard
    val firstShard = Shards.epochOrder(NShards, 1).head
    assert(epoch.select("shard").first().getInt(0) == firstShard)
  }
}
