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

  test("rebuild picks identical centroids (content-addressed sampling)") {
    val d2 = Files.createTempDirectory("ivf2").toString
    IvfIndex.build(emb, d2, nCells = 16)
    val a = spark.read.parquet(s"$dir/centroids").select("cid").collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(s"$d2/centroids").select("cid").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }
}
