package graft

import java.nio.file.{Files, Paths}

import graft.batch.FsLease

/** The shared cross-process lease's round-15 hardening (round-14
  * ADVICE): lease breaks and releases go through an atomic
  * rename-to-tombstone with the MOVED bytes re-verified (no
  * read-then-delete window that could kill a fresh foreign claim), a
  * release never deletes a claim that is no longer ours, and a body
  * that overruns the TTL fails LOUDLY — at [[FsLease.renewOrFail]]
  * before its commit step, or at release from [[FsLease.withLease]] —
  * instead of silently losing mutual exclusion.
  */
class FsLeaseSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("fs_lease").toString

  private def leaseFile(dir: String) = Paths.get(dir, "_GRAFT_LEASE")

  /** Plant through the Hadoop FS layer, like a real foreign process
    * would (NIO over a Hadoop-created file leaves a stale local-FS
    * checksum sidecar — a corruption, not a takeover). */
  private def plantForeign(dir: String, expiryMs: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_GRAFT_LEASE")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"owner":"some-other-process","expiry":$expiryMs}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  test("a body that loses the lease fails loudly at release, and the " +
    "usurper's claim survives") {
    val dir = tmpDir()
    val e = intercept[IllegalStateException] {
      FsLease.guarded(spark, dir, "test op") {
        // simulate a TTL overrun + takeover: a foreign live claim
        // replaces ours mid-body
        plantForeign(dir, System.currentTimeMillis() + 3600000L)
      }
    }
    assert(e.getMessage.contains("lease had been lost"), e.getMessage)
    // release must NOT have deleted the foreign live claim
    assert(Files.exists(leaseFile(dir)))
    assert(Files.readString(leaseFile(dir)).contains("some-other-process"))
  }

  test("a FAILING body that also lost the lease keeps its own exception " +
    "(the loss does not mask it) and still leaves the usurper's claim") {
    val dir = tmpDir()
    val e = intercept[IllegalStateException] {
      FsLease.guarded(spark, dir, "test op") {
        plantForeign(dir, System.currentTimeMillis() + 3600000L)
        throw new IllegalStateException("body failed first")
      }
    }
    assert(e.getMessage == "body failed first")
    assert(Files.readString(leaseFile(dir)).contains("some-other-process"))
  }

  test("renewOrFail re-stamps a live claim in place and throws when usurped") {
    val dir = tmpDir()
    // happy path: renew inside an owned scope extends expiry
    FsLease.guarded(spark, dir, "test op") {
      val before = Files.readString(leaseFile(dir))
      Thread.sleep(5)
      FsLease.renewOrFail(spark, dir, "test op")
      val after = Files.readString(leaseFile(dir))
      val exp = """"expiry"\s*:\s*(\d+)""".r
      def expiry(s: String) = exp.findFirstMatchIn(s).get.group(1).toLong
      assert(expiry(after) > expiry(before), s"$before -> $after")
    }
    assert(!Files.exists(leaseFile(dir)))
    // usurped before the commit: renewOrFail throws, naming the cause
    val e = intercept[IllegalStateException] {
      FsLease.guarded(spark, dir, "test op") {
        plantForeign(dir, System.currentTimeMillis() + 3600000L)
        FsLease.renewOrFail(spark, dir, "test op")
      }
    }
    assert(e.getMessage.contains("overran the lease TTL"), e.getMessage)
    assert(Files.readString(leaseFile(dir)).contains("some-other-process"))
  }

  test("renewOrFail with the claim GONE (broken and released by a usurper) " +
    "throws and leaves no tombstone debris") {
    val dir = tmpDir()
    val e = intercept[IllegalStateException] {
      FsLease.guarded(spark, dir, "test op") {
        Files.delete(leaseFile(dir)) // usurper broke us, then released
        FsLease.renewOrFail(spark, dir, "test op")
      }
    }
    assert(e.getMessage.contains("overran the lease TTL"), e.getMessage)
    val it = Files.list(Paths.get(dir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (it.hasNext) names += it.next().getFileName.toString
    assert(!names.exists(_.startsWith(".lease_tomb_")), names.mkString(", "))
  }

  test("commit-point renews and the heartbeat never trip each other: the " +
    "renew's atomic move is serialized per dir within the JVM") {
    val dir = tmpDir()
    spark.conf.set("spark.graft.indexLeaseMs", "300") // beat every 100 ms
    try {
      FsLease.guarded(spark, dir, "test op") {
        // hammer commit-point renews across several heartbeat periods:
        // concurrent renews must serialize per dir (unserialized claim
        // writes could interleave a stale expiry over a fresh one) and
        // every renew must see a live-with-margin claim — at TTL 300
        // the margin is 50 ms and the heartbeat re-stamps every 100 ms,
        // so a renew can only fail here if renewal itself regressed
        val deadline = System.currentTimeMillis() + 900
        while (System.currentTimeMillis() < deadline) {
          FsLease.renewOrFail(spark, dir, "test op")
          Thread.sleep(7)
        }
        assert(Files.exists(leaseFile(dir)))
      }
      assert(!Files.exists(leaseFile(dir)))
    } finally spark.conf.unset("spark.graft.indexLeaseMs")
  }

  test("the heartbeat keeps a long body's claim alive past the TTL") {
    val dir = tmpDir()
    spark.conf.set("spark.graft.indexLeaseMs", "400") // beat every ~133 ms
    try {
      val exp = """"expiry"\s*:\s*(\d+)""".r
      def expiry() = exp.findFirstMatchIn(Files.readString(leaseFile(dir)))
        .get.group(1).toLong
      FsLease.guarded(spark, dir, "test op") {
        val e0 = expiry()
        Thread.sleep(1200) // 3× the TTL — unrenewed, the claim would lapse
        val e1 = expiry()
        assert(e1 > e0, "heartbeat must have re-stamped the claim")
        assert(e1 > System.currentTimeMillis(),
          "the claim must never have lapsed mid-body")
      }
      assert(!Files.exists(leaseFile(dir)))
    } finally spark.conf.unset("spark.graft.indexLeaseMs")
  }

  test("breaking an expired claim is atomic: no tombstone debris, and a " +
    "release after takeover removes only our own claim") {
    val dir = tmpDir()
    plantForeign(dir, System.currentTimeMillis() - 1L)
    FsLease.guarded(spark, dir, "test op") {
      assert(!Files.readString(leaseFile(dir)).contains("some-other-process"))
    }
    assert(!Files.exists(leaseFile(dir)))
    val debris = Files.list(Paths.get(dir)).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (debris.hasNext) names += debris.next().getFileName.toString
    assert(!names.exists(_.startsWith(".lease_tomb_")), names.mkString(", "))
  }

  test("a live foreign claim refuses the writer and is left untouched") {
    val dir = tmpDir()
    plantForeign(dir, System.currentTimeMillis() + 3600000L)
    val before = Files.readString(leaseFile(dir))
    val e = intercept[IllegalStateException](
      FsLease.guarded(spark, dir, "test op") { () })
    assert(e.getMessage.contains("some-other-process"), e.getMessage)
    assert(Files.readString(leaseFile(dir)) == before)
  }
}
