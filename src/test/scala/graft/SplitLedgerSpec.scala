package graft

import org.apache.spark.sql.functions._

import graft.batch.{Dedup, SplitLedger}

/** The sticky split ledger (round-13 verdict #1): append sequences
  * never migrate a doc out of train, merged clusters inherit the
  * train-est recorded split, assignments stay leakage-closed within
  * every version, and the version install is crash-safe.
  */
class SplitLedgerSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("split_ledger").toString

  private def membersDf(rows: (Long, Long)*) =
    rows.toDF("doc_id", "cluster_id")

  /** The hash rule evaluated on one literal id, so tests can PICK
    * cluster ids with known fresh splits instead of asserting blind. */
  private def hashSplit(id: Long): String =
    Seq(id).toDF("x").select(Dedup.hashSplitOf(col("x"))).head.getString(0)

  // content-addressed fresh splits for small ids — found once, used to
  // construct interesting merges below
  private lazy val trainId = (1L to 500L).find(hashSplit(_) == "train").get
  private lazy val valId = (1L to 500L).find(hashSplit(_) == "val").get
  private lazy val testId = (1L to 500L).find(hashSplit(_) == "test").get

  test("v1 assigns by content hash; untouched clusters never move") {
    val dir = tmpDir()
    val v1 = SplitLedger.assign(spark, dir,
      membersDf(1L -> trainId, 2L -> trainId, 5L -> valId, 9L -> testId))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v1(1L) == "train" && v1(2L) == "train")
    assert(v1(5L) == hashSplit(valId) && v1(9L) == hashSplit(testId))
    // v2: same clusters plus one fresh doc — nothing recorded moves
    val v2 = SplitLedger.assign(spark, dir,
      membersDf(1L -> trainId, 2L -> trainId, 5L -> valId, 9L -> testId,
        42L -> 42L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v1.forall { case (id, sp) => v2(id) == sp })
    assert(v2(42L) == hashSplit(42L))
    assert(SplitLedger.currentVersion(spark, dir) == 2L)
  }

  test("a bridging append pulls the merged cluster to the train-est prior") {
    val dir = tmpDir()
    // v1: a train cluster and a test cluster (fresh hash gives both)
    SplitLedger.assign(spark, dir,
      membersDf(10L -> trainId, 11L -> trainId, 20L -> testId, 21L -> testId))
    // v2: doc 30 bridges them; min-id relabel would re-hash the union
    // under label trainId — but even if the union's label were the TEST
    // cluster's, inheritance must still say train. Use the test id as
    // the merged label to prove the label itself is irrelevant.
    val v2 = SplitLedger.assign(spark, dir,
      membersDf(10L -> testId, 11L -> testId, 20L -> testId, 21L -> testId,
        30L -> testId))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every member of the merged cluster — including the former test
    // docs and the fresh bridge — lands in train
    assert(v2.values.toSet == Set("train"))
  }

  test("no doc ever leaves train across an append sequence; val beats test") {
    val dir = tmpDir()
    val v1 = SplitLedger.assign(spark, dir,
      membersDf(1L -> trainId, 5L -> valId, 9L -> testId))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // v2: merge the val and test clusters (not train): union takes val
    val v2 = SplitLedger.assign(spark, dir,
      membersDf(1L -> trainId, 5L -> valId, 9L -> valId, 7L -> valId))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v2(5L) == "val" && v2(9L) == "val" && v2(7L) == "val")
    // v3: now merge everything with the train cluster
    val v3 = SplitLedger.assign(spark, dir,
      membersDf(1L -> trainId, 5L -> trainId, 9L -> trainId, 7L -> trainId))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v3.values.toSet == Set("train"))
    // the cross-version invariant, stated over the whole sequence
    for (v <- Seq(v2, v3); (id, sp) <- v1 if sp == "train")
      assert(v(id) == "train", s"doc $id left train: $sp -> ${v(id)}")
  }

  test("a vanished doc keeps its recorded split when it reappears") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 2L -> trainId))
    // v2: doc 2 vanishes (re-crawl gap)
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    // v3: doc 2 reappears as a singleton — must NOT be re-rolled
    val v3 = SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 2L -> 2L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v3(2L) == "train")
  }

  test("a crashed (uncommitted) next-version write is overwritten cleanly") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    // simulate a crash: the next version's diff parquet exists (fully
    // or partially written), meta still says v1 — the delta layout's
    // crash artifact
    Seq((999L, "test")).toDF("doc_id", "split")
      .write.mode("overwrite").parquet(s"$dir/diff_v2")
    assert(SplitLedger.currentVersion(spark, dir) == 1L)
    val v2 = SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 3L -> 3L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(SplitLedger.currentVersion(spark, dir) == 2L)
    assert(v2(1L) == "train" && !v2.contains(999L))
    assert(SplitLedger.read(spark, dir).get
      .filter(col("doc_id") === 999L).isEmpty)
  }

  test("a missing or damaged meta.json self-heals to the committed version") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 2L -> 2L))
    // crash inside the commit rename window: meta absent, both ledger
    // parquets committed — the fallback resolves to the newest one
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "meta.json"))
    assert(SplitLedger.currentVersion(spark, dir) == 2L)
    assert(SplitLedger.read(spark, dir).get.count() == 2L)
    // damaged (unparseable) meta heals the same way, and the next
    // assign reinstates a clean one
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "meta.json"), "not json at all")
    assert(SplitLedger.currentVersion(spark, dir) == 2L)
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 3L -> 3L))
    assert(SplitLedger.currentVersion(spark, dir) == 3L)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "meta.json")).contains("\"ver\":3"))
  }

  test("the returned assignment survives the next version's retirement sweep") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    val v2 = SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 2L -> 2L))
    // two more assigns retire every parquet v2's plan could have read
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    // materialized result: still collectable (a lazy frame would throw
    // FileNotFoundException on the swept ledger_v1)
    assert(v2.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("delta layout: diffs carry only added-or-changed rows, compaction " +
    "bounds the chain, and the old chain retires after one version's grace") {
    val dir = tmpDir()
    spark.conf.set("spark.graft.ledgerCompactEvery", "3")
    try {
      def names = new java.io.File(dir).listFiles().map(_.getName).toSet
      SplitLedger.assign(spark, dir, membersDf(1L -> trainId, 2L -> valId))
      assert(names.contains("ledger_v1"), s"v1 must be a full base: $names")
      // v2 adds doc 3 and changes nothing → the diff holds EXACTLY it
      SplitLedger.assign(spark, dir,
        membersDf(1L -> trainId, 2L -> valId, 3L -> 3L))
      val d2 = spark.read.parquet(s"$dir/diff_v2").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(d2.toSeq == Seq(3L -> hashSplit(3L)), d2.mkString(", "))
      // v3: doc 2's cluster merges with train → the diff holds exactly
      // the CHANGED row (doc 2), not the stable corpus
      SplitLedger.assign(spark, dir,
        membersDf(1L -> trainId, 2L -> trainId, 3L -> 3L))
      val d3 = spark.read.parquet(s"$dir/diff_v3").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(d3.toSeq == Seq(2L -> "train"), d3.mkString(", "))
      // v4 hits the cadence ((4 − 1) ≥ 3) → fresh base; the old chain
      // survives its one-version grace
      SplitLedger.assign(spark, dir,
        membersDf(1L -> trainId, 2L -> trainId, 3L -> 3L))
      assert(names.contains("ledger_v4") &&
        names.contains("ledger_v1") && names.contains("diff_v2"), s"$names")
      // the audit still reads ver−1 across the compaction boundary
      assert(SplitLedger.audit(spark, dir).collect().nonEmpty)
      // v5 commits on top of the new base → the old chain is swept
      SplitLedger.assign(spark, dir,
        membersDf(1L -> trainId, 2L -> trainId, 3L -> 3L))
      assert(!names.contains("ledger_v1") && !names.contains("diff_v2") &&
        !names.contains("diff_v3"), s"old chain must retire: $names")
      assert(names.contains("ledger_v4") && names.contains("diff_v5"))
      // semantics unchanged end to end
      val led = SplitLedger.read(spark, dir).get.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(led == Map(1L -> "train", 2L -> "train", 3L -> hashSplit(3L)))
    } finally spark.conf.unset("spark.graft.ledgerCompactEvery")
  }

  test("delta layout writes O(changed) bytes per version, not O(corpus)") {
    val dir = tmpDir()
    // a stable 5000-doc corpus with 50 fresh docs per version — the
    // append-dominated shape a real corpus-versioning cadence has
    def versionMembers(v: Int) =
      (1L to (5000L + 50L * v)).toDF("doc_id")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
    def bytesUnder(prefix: String) =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith(prefix))
        .map(d => d.listFiles().map(_.length()).sum).sum
    (1 to 5).foreach(v => SplitLedger.assign(spark, dir, versionMembers(v)))
    val baseBytes = bytesUnder("ledger_v")
    val diffBytes = bytesUnder("diff_v")
    // the full-rewrite layout would have written ~5 bases; the delta
    // layout writes one base + four ~1%-sized diffs
    assert(diffBytes.toDouble / baseBytes < 0.5,
      s"diff chain ($diffBytes B over 4 versions) should be far below one " +
        s"full base ($baseBytes B)")
    // and the reconstruction is complete
    assert(SplitLedger.read(spark, dir).get.count() == 5250L)
  }

  test("a live foreign lease refuses assign, by name; expired is taken over") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_GRAFT_LEASE"),
      s"""{"owner":"some-other-process","expiry":${System.currentTimeMillis() + 3600000L}}""")
    val e = intercept[IllegalStateException](
      SplitLedger.assign(spark, dir, membersDf(1L -> trainId)))
    assert(e.getMessage.contains("lease") &&
      e.getMessage.contains("some-other-process"), e.getMessage)
    assert(SplitLedger.currentVersion(spark, dir) == 1L)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_GRAFT_LEASE"),
      s"""{"owner":"some-other-process","expiry":${System.currentTimeMillis() - 1L}}""")
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    assert(SplitLedger.currentVersion(spark, dir) == 2L)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_GRAFT_LEASE")))
  }

  test("audit reports cross-version transitions; every move is toward train") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir,
      membersDf(10L -> trainId, 20L -> testId, 21L -> testId))
    intercept[IllegalArgumentException](SplitLedger.audit(spark, dir))
    // v2 merges the test cluster into train and adds a fresh doc
    SplitLedger.assign(spark, dir,
      membersDf(10L -> trainId, 20L -> trainId, 21L -> trainId, 30L -> 30L))
    val a = SplitLedger.audit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a(("train", "train")) == 1L) // doc 10 stays
    assert(a(("test", "train")) == 2L) // docs 20/21 pulled out of eval
    assert(a((null, hashSplit(30L))) == 1L) // the fresh doc
    // the invariant the audit exists to watch: nothing leaves train
    assert(!a.keySet.exists { case (p, s) => p == "train" && s != "train" })
  }

  test("two concurrent same-JVM assigns serialize: both commit, no lost update") {
    val dir = tmpDir()
    SplitLedger.assign(spark, dir, membersDf(1L -> trainId))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() =>
        try SplitLedger.assign(spark, dir,
          membersDf(1L -> trainId, (10L + i) -> (10L + i)))
        catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent assign threw: ${errs.peek()}")
    // serialized through the fence: versions 2 AND 3 both committed,
    // and the loser's new doc survives via vanished-doc retention
    assert(SplitLedger.currentVersion(spark, dir) == 3L)
    val led = SplitLedger.read(spark, dir).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(led.contains(11L) && led.contains(12L) && led(1L) == "train")
  }

  test("streamed corpus: assignSplits on the ingest cadence is sticky across epochs") {
    import graft.stream.IngestDedup
    val root = java.nio.file.Files.createTempDirectory("split_ingest").toString
    val dir = s"$root/out"; val ledger = s"$root/ledger"
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tonight")
    val other = "completely different content with no shared shingles at all here now"
    IngestDedup.ingestBatch(
      Seq((10L, base), (20L, other)).toDF("doc_id", "text"), dir, epochId = 0)
    val v1 = IngestDedup.assignSplits(spark, dir, ledger)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v1.keySet == Set(10L, 20L))
    // epoch 1: a near-dup of 10 arrives (rejected, resolved to 10's
    // cluster) and a fresh doc is admitted
    IngestDedup.ingestBatch(
      Seq((30L, nearDup), (40L, other + " but this one is genuinely novel text"))
        .toDF("doc_id", "text"), dir, epochId = 1)
    val v2 = IngestDedup.assignSplits(spark, dir, ledger)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // prior assignments never move; the rejected dup inherits its
    // cluster's recorded split (content closure across the stream)
    assert(v1.forall { case (id, sp) => v2(id) == sp })
    assert(v2(30L) == v1(10L), "a rejected dup must share its owner's split")
    assert(SplitLedger.currentVersion(spark, ledger) == 2L)
  }

  test("fixture corpus: two real versions, zero out-of-train migrations, " +
    "leakage-closed in both") {
    val dir = tmpDir()
    val d = "/root/testdata/sf0.001"
    val all = Tables.spread(Tables.documents(spark, d))
    val v1docs = all.filter(pmod(col("doc_id"), lit(7)) =!= 3)
    val m1 = Dedup.membersOf(v1docs.select(col("doc_id")),
      Dedup.dupLabelsOf(v1docs)).localCheckpoint()
    val m2 = Dedup.membersOf(all.select(col("doc_id")),
      Dedup.dupLabelsOf(all)).localCheckpoint()
    val v1 = SplitLedger.assign(spark, dir, m1).localCheckpoint()
    val v2 = SplitLedger.assign(spark, dir, m2).localCheckpoint()
    // the qd20 invariant, on the REAL graph: nothing leaves train, and
    // every move is toward train
    val moved = v2.join(
      v1.select(col("doc_id"), col("split").as("p")), Seq("doc_id"))
      .filter(col("split") =!= col("p"))
    assert(moved.filter(col("p") === "train").count() == 0L)
    assert(moved.filter(col("p") === "val" && col("split") === "test").count() == 0L)
    // leakage-closure within each version: split is constant per cluster
    for (v <- Seq(v1, v2))
      assert(v.groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count() == 0L)
    // and the ledger agrees with qd20's functional twin on v2's splits
    val twin = Dedup.stickySplits(m2,
      m1.withColumn("split", Dedup.hashSplitOf(col("cluster_id")))
        .select(col("doc_id"), col("split")))
    assert(v2.select("doc_id", "split").except(twin.select("doc_id", "split")).isEmpty)
  }
}
