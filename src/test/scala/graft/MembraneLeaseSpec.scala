package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.stream.EmbedIngest

/** The streaming membrane's maintenance fence — the same FsLease the
  * IvfIndex installs hold, applied to requantize/compactCells (the
  * out-of-band ops a second application could tick): live foreign
  * lease refuses by name, expired is taken over, and the READ paths
  * (corpus/survivors via recoverRequant) skip crash-recovery under a
  * foreign lease instead of failing.
  */
class MembraneLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val dir = Files.createTempDirectory("graft_mem_lease").toString + "/idx"
    EmbedIngest.init(spark, dir,
      Seq((1L, Seq(1f, 0f), 1.0), (2L, Seq(0f, 1f), 1.0)).toDF("cid", "ce", "cn"))
    EmbedIngest.ingestBatch(Seq(
      (1L, Seq(1f, 0f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding"), dir, epochId = 0, tau = 0.99)
    EmbedIngest.ingestBatch(Seq(
      (5L, Seq(0.7f, 0.714f))
    ).toDF("vec_id", "embedding"), dir, epochId = 1, tau = 0.99)
    dir
  }

  private def plantLease(dir: String, expiryMs: Long): Unit =
    Files.writeString(Paths.get(dir, "_GRAFT_LEASE"),
      s"""{"owner":"some-other-process","expiry":$expiryMs}""")

  test("a live foreign lease refuses requantize and compactCells, by name") {
    val dir = freshDir()
    plantLease(dir, System.currentTimeMillis() + 3600000L)
    for (op <- Seq[() => Unit](
        () => EmbedIngest.requantize(spark, dir, nCells = 0, upTo = 2L),
        () => EmbedIngest.compactCells(spark, dir, upTo = 2L))) {
      val e = intercept[IllegalStateException](op())
      assert(e.getMessage.contains("lease") &&
        e.getMessage.contains("some-other-process"), e.getMessage)
    }
    // reads are unaffected by the foreign lease
    assert(EmbedIngest.corpus(spark, dir).count() == 3L)
  }

  test("an expired foreign lease is broken; maintenance proceeds and releases") {
    val dir = freshDir()
    plantLease(dir, System.currentTimeMillis() - 1L)
    EmbedIngest.requantize(spark, dir, nCells = 0, upTo = 2L)
    assert(!Files.exists(Paths.get(dir, "_GRAFT_LEASE")))
    assert(EmbedIngest.corpus(spark, dir).count() == 3L)
  }

  test("a reader under a live foreign lease skips recovery but still serves") {
    val dir = freshDir()
    // committed-but-uninstalled requantize snapshot: the crash window
    EmbedIngest.writeRequantSnapshot(spark, dir, nCells = 2, upTo = 2L)
    plantLease(dir, System.currentTimeMillis() + 3600000L)
    // corpus() runs recoverRequant — it must neither install nor fail
    assert(EmbedIngest.corpus(spark, dir).count() == 3L)
    assert(Files.list(Paths.get(dir)).anyMatch(_.getFileName.toString
      .startsWith(".requant_tmp_")), "recovery must be skipped under a foreign lease")
    // lease gone → the next read finishes the install; same corpus
    Files.delete(Paths.get(dir, "_GRAFT_LEASE"))
    assert(EmbedIngest.corpus(spark, dir).count() == 3L)
    assert(!Files.list(Paths.get(dir)).anyMatch(_.getFileName.toString
      .startsWith(".requant_tmp_")), "recovery must run once the lease clears")
    // and the re-celled layout still answers membrane probes
    EmbedIngest.ingestBatch(Seq(
      (9L, Seq(1f, 0f)) // dup of corpus 1 — must still be rejected
    ).toDF("vec_id", "embedding"), dir, epochId = 2, tau = 0.99)
    assert(EmbedIngest.corpus(spark, dir).filter(col("vec_id") === 9L).isEmpty)
  }
}
