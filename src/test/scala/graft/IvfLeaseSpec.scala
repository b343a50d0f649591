package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.batch.IvfIndex

/** The cross-process install lease (round-13 verdict #2): a live
  * foreign `_GRAFT_LEASE` makes every writer fail by name instead of
  * double-installing a generation; expired leases are broken and taken
  * over; readers never fail under a foreign lease — they skip crash
  * recovery and serve the committed meta.
  */
class IvfLeaseSpec extends SparkSpec {

  private lazy val emb =
    Tables.embeddings(spark, "/root/testdata/sf0.01").limit(300).localCheckpoint()

  private def freshIndex(): String = {
    val d = Files.createTempDirectory("ivf_lease").toString
    IvfIndex.build(emb, d, nCells = 8)
    d
  }

  private def plantLease(dir: String, expiryMs: Long): Unit =
    Files.writeString(Paths.get(dir, "_GRAFT_LEASE"),
      s"""{"owner":"some-other-process","expiry":$expiryMs}""")

  private def live = System.currentTimeMillis() + 3600000L
  private def expired = System.currentTimeMillis() - 1L

  test("a live foreign lease refuses every writer, by name") {
    val d = freshIndex()
    plantLease(d, live)
    for (write <- Seq[() => Unit](
        () => IvfIndex.appendBatch(spark, d, emb.limit(10)),
        () => IvfIndex.rebuild(spark, d, emb, nCells = 8),
        () => IvfIndex.rebuildIfGrown(spark, d, emb),
        () => IvfIndex.build(emb, d, nCells = 8))) {
      val e = intercept[IllegalStateException](write())
      assert(e.getMessage.contains("lease") &&
        e.getMessage.contains("some-other-process"), e.getMessage)
    }
    // the refused writers must not have touched the layout
    assert(IvfIndex.search(spark, d, emb.limit(5), k = 2, nProbe = 8).count() > 0)
  }

  test("an expired foreign lease is broken and the write proceeds") {
    val d = freshIndex()
    plantLease(d, expired)
    val before = spark.read.parquet(IvfIndex.cellsPath(spark, d)).count()
    IvfIndex.appendBatch(spark, d,
      emb.limit(10).withColumn("vec_id", col("vec_id") + 1000000L))
    assert(spark.read.parquet(IvfIndex.cellsPath(spark, d)).count() == before + 10)
    // and the taken-over lease is released afterwards
    assert(!Files.exists(Paths.get(d, "_GRAFT_LEASE")))
  }

  test("writers release the lease on success and on failure") {
    val d = freshIndex()
    IvfIndex.rebuild(spark, d, emb, nCells = 8)
    assert(!Files.exists(Paths.get(d, "_GRAFT_LEASE")))
    // a failing write (batch missing nothing → force failure via an
    // empty corpus rebuild) must still release
    intercept[Exception](
      IvfIndex.rebuild(spark, d, emb.filter(lit(false)), nCells = 8))
    assert(!Files.exists(Paths.get(d, "_GRAFT_LEASE")))
  }

  test("a reader under a live foreign lease skips recovery but still serves") {
    val d = freshIndex()
    // committed-but-uninstalled snapshot: the crash window
    val meta = IvfIndex.metaOf(spark, d)
    IvfIndex.writeRebuildSnapshot(spark, d, emb, 8, meta)
    plantLease(d, live)
    // search must neither install (the foreign writer owns it) nor fail
    assert(IvfIndex.search(spark, d, emb.limit(5), k = 2, nProbe = 8).count() > 0)
    assert(Files.exists(Paths.get(d, ".rebuild_tmp")),
      "recovery must be skipped under a live foreign lease")
    assert(IvfIndex.metaOf(spark, d).gen == meta.gen, "meta must be untouched")
    // lease gone (expired or released by its owner) → the next reader
    // finishes the install
    Files.delete(Paths.get(d, "_GRAFT_LEASE"))
    assert(IvfIndex.search(spark, d, emb.limit(5), k = 2, nProbe = 8).count() > 0)
    assert(!Files.exists(Paths.get(d, ".rebuild_tmp")))
    assert(IvfIndex.metaOf(spark, d).gen == meta.gen + 1)
  }

  test("nested writers share one lease: rebuildIfGrown's inner rebuild") {
    val d = freshIndex()
    // meta.rows is the build count; doubling the layout makes it due
    IvfIndex.appendBatch(spark, d,
      emb.withColumn("vec_id", col("vec_id") + 2000000L))
    assert(IvfIndex.rebuildIfGrown(spark, d,
      emb.unionByName(emb.withColumn("vec_id", col("vec_id") + 2000000L))))
    assert(!Files.exists(Paths.get(d, "_GRAFT_LEASE")))
  }
}
