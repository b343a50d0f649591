package graft

import org.apache.spark.sql.functions._

import graft.batch.Dedup

/** qd18's cluster-closed split: partition totality, structural closure
  * (zero near-dup edges cross splits under the cluster rule), and the
  * operator's reason to exist (the naive doc-hash rule leaks).
  */
class LeakageSplitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("splits partition the corpus and the audit columns reconcile") {
    val rows = Dedup.qd18_leakage_split(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(3)).sum ===
      docs.agg(sum("doc_id")).head.getLong(0))
    // the naive doc-hash split leaks near-dup edges; the whole point
    val leaked = rows.map(_.getLong(4)).sum
    assert(leaked > 0, s"fixture must exhibit naive-split leakage, got $leaked")
  }

  test("the cluster rule is leakage-CLOSED: no near-dup edge crosses splits") {
    val labels = Dedup.dupLabels(spark, dir) // already checkpointed
    val bucket = pmod(conv(substring(md5(col("cluster_id").cast("string")
      .cast("binary")), 1, 6), 16, 10).cast("long"), lit(100))
    val sp = labels.select(col("id"), col("label").as("cluster_id"))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
    val crossing = labels.filter(col("id") =!= col("label"))
      .join(sp.select(col("id"), col("split").as("a")), "id")
      .join(sp.select(col("id").as("label"), col("split").as("b")), "label")
      .filter(col("a") =!= col("b"))
    assert(crossing.count() === 0L)
  }
}
