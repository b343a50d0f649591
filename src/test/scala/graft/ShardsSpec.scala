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

  test("split-tagged shards: layout is split-pure, the manifest agrees with " +
    "disk, and a version-N+1 re-shard never moves a doc out of train") {
    import graft.batch.Curation
    val root = Files.createTempDirectory("split_shards").toString
    val ledger = s"$root/ledger"
    val all = Tables.spread(docs)
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val corpusAll = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    // version 1: a subset of the corpus (the pre-append crawl)
    val corpusV1 = corpusAll.filter(pmod(col("doc_id"), lit(7)) =!= 3)
    val p = Curation.Params(splitLedgerDir = Some(ledger))
    Curation.curateToShards(corpusV1, ev, s"$root/v1", NShards, p)
    def shardSplits(dir: String) = spark.read.parquet(s"$dir/shards")
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v1 = shardSplits(s"$root/v1")
    assert(v1.nonEmpty && v1.values.toSet.subsetOf(Set("train", "val", "test")))
    // layout purity: each split=S/shard=N directory holds one split
    val layout = spark.read.parquet(s"$root/v1/shards")
      .groupBy(col("split"), col("shard"))
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(layout.forall(_.getLong(2) == 1L))
    // manifest agrees with disk per (split, shard)
    val manifest = spark.read.parquet(s"$root/v1/manifest")
      .orderBy("split", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4))).toMap
    val disk = spark.read.parquet(s"$root/v1/shards")
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(manifest == disk, s"manifest $manifest != disk $disk")
    // version 2: the full corpus (appended docs, incl. bridges) against
    // the SAME ledger — the sticky rule must hold through the shards
    Curation.curateToShards(corpusAll, ev, s"$root/v2", NShards, p)
    val v2 = shardSplits(s"$root/v2")
    assert(graft.batch.SplitLedger.currentVersion(spark, ledger) == 2L)
    for ((id, sp) <- v1 if sp == "train" && v2.contains(id))
      assert(v2(id) == "train", s"doc $id left train in the v2 shards: ${v2(id)}")
    // and every move between the shard sets is TOWARD train
    for ((id, sp) <- v1 if v2.contains(id) && v2(id) != sp)
      assert(v2(id) == "train" || (sp == "test" && v2(id) == "val"),
        s"doc $id moved away from train: $sp -> ${v2(id)}")
  }

  test("versionBump: cross-corpus admission → sticky ledger → split-tagged " +
    "re-shard, end to end across two corpus versions (round-15 verdict #3)") {
    import graft.batch.Curation
    val root = Files.createTempDirectory("version_bump").toString
    val ledger = s"$root/ledger"
    val all = Tables.spread(docs)
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val corpusAll = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val v1 = corpusAll.filter(pmod(col("doc_id"), lit(3)) =!= 1)
    val p = Curation.Params(splitLedgerDir = Some(ledger))
    Curation.curateToShards(v1, ev, s"$root/v1", NShards, p)
    // the next crawl dump: genuinely new docs plus RE-CRAWLS — exact
    // copies of version-1 texts under fresh ids, which the cross-corpus
    // admission must reject (identical text ⇒ identical signature ⇒
    // same buckets, full 6/6 signature match)
    val fresh = corpusAll.filter(pmod(col("doc_id"), lit(3)) === 1)
    val recrawl = v1.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val report = Curation.versionBump(v1, fresh.unionByName(recrawl), ev,
      s"$root/v2", NShards, p).head()
    assert(report.getLong(0) == 2L, s"ledger must be at version 2: $report")
    val nNew = fresh.count() + recrawl.count()
    assert(report.getLong(1) == nNew)
    assert(report.getLong(2) >= recrawl.count(),
      s"every re-crawl must be rejected: $report")
    assert(report.getLong(3) == report.getLong(1) - report.getLong(2))
    def shardSplits(dir: String) = spark.read.parquet(s"$dir/shards")
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = shardSplits(s"$root/v1")
    val s2 = shardSplits(s"$root/v2")
    // rejected re-crawls never reach the version-2 layout
    assert(!s2.keys.exists(_ >= 1000000L),
      "a rejected re-crawl id surfaced in the v2 shards")
    // admitted-set ∩ prior-train stability: nothing leaves train, and
    // every split move is toward train
    for ((id, sp) <- s1 if sp == "train" && s2.contains(id))
      assert(s2(id) == "train", s"doc $id left train in v2: ${s2(id)}")
    for ((id, sp) <- s1 if s2.contains(id) && s2(id) != sp)
      assert(s2(id) == "train" || (sp == "test" && s2(id) == "val"),
        s"doc $id moved away from train: $sp -> ${s2(id)}")
    // and some version-1 docs really did carry through (non-vacuous)
    assert(s1.keySet.intersect(s2.keySet).nonEmpty)
  }

  test("versionBump sigStore: the second bump reads the persisted signature " +
    "table instead of re-minhashing the prior corpus — one fewer full text " +
    "pass, identical output; version-misaligned tables are refused") {
    import graft.batch.{Curation, Dedup, SplitLedger}
    val root = Files.createTempDirectory("vbump_sigs").toString
    val all = Tables.spread(docs)
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val corpusAll = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val v1 = corpusAll.filter(pmod(col("doc_id"), lit(3)) === 0)
    val new1 = corpusAll.filter(pmod(col("doc_id"), lit(3)) === 1)
    val new2 = corpusAll.filter(pmod(col("doc_id"), lit(3)) === 2)
    val store = s"$root/sigs"
    // two independent, identically-driven pipelines: A recomputes
    // prior signatures each bump, B persists them through the store
    def drive(tag: String, sigStore: Option[String],
        tick: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val p = Curation.Params(splitLedgerDir = Some(s"$root/ledger_$tag"))
      Curation.curateToShards(v1, ev, s"$root/${tag}_v1", NShards, p)
      Curation.versionBump(v1, new1, ev, s"$root/${tag}_v2", NShards, p, sigStore)
      // merged corpus after bump 1, reconstructed through the same
      // public machinery (deterministic — identical to the bump's own)
      val sigs = Dedup.minhashSigsOf(v1).withColumn("is_new", lit(false))
        .unionByName(Dedup.minhashSigsOf(new1).withColumn("is_new", lit(true)))
        .localCheckpoint()
      val dup1 = Dedup.crossCorpusNearDup(sigs, col("is_new"), Dedup.CellCap)
        .select(col("doc_id"))
      val merged1 = v1.unionByName(new1.join(dup1, Seq("doc_id"), "left_anti"))
        .localCheckpoint()
      val rep = Curation.versionBump(merged1.filter(tick(lit(true))), new2, ev,
        s"$root/${tag}_v3", NShards, p, sigStore)
        .collect().head
      (rep, merged1.count())
    }
    val passesA = spark.sparkContext.longAccumulator("vbump_a")
    val passesB = spark.sparkContext.longAccumulator("vbump_b")
    val tickA = udf((b: Boolean) => { passesA.add(1); b }).asNondeterministic()
    val tickB = udf((b: Boolean) => { passesB.add(1); b }).asNondeterministic()
    val (repA, nPrior) = drive("a", None, c => tickA(c))
    val (repB, _) = drive("b", Some(store), c => tickB(c))
    assert(repA == repB, s"store mode diverged: $repA vs $repB")
    // the store saved exactly the prior-side pass: B's second bump
    // evaluated the prior corpus one full pass fewer than A's
    assert(passesA.value - passesB.value == nPrior,
      s"expected exactly one fewer prior pass: A=${passesA.value} " +
        s"B=${passesB.value} nPrior=$nPrior")
    // version alignment: the CURRENT ledger version's table loads;
    // versions never saved (v1 pre-dates the store; v4 is the future)
    // must not resolve — a mismatch means the fallback recompute runs
    val verB = SplitLedger.currentVersion(spark, s"$root/ledger_b")
    assert(verB == 3L)
    assert(Dedup.loadSigs(spark, store, verB).isDefined)
    assert(Dedup.loadSigs(spark, store, 1L).isEmpty,
      "a never-saved version must not resolve")
    assert(Dedup.loadSigs(spark, store, verB + 1).isEmpty,
      "an uncommitted future version must never resolve")
    // the saved table describes the merged corpus: its ids ⊆ merged
    // ids, and every SIGNED new1-admitted doc is present
    val shardB = spark.read.parquet(s"$root/b_v3/shards")
      .select("doc_id").distinct()
    val sigIds = Dedup.loadSigs(spark, store, verB).get.select("doc_id")
    assert(shardB.join(sigIds, Seq("doc_id"), "left_anti").isEmpty,
      "a sharded doc is missing from the persisted signature table")
  }

  test("readEpochSplit opens ONE split's shards (pruned read, epoch-permuted); " +
    "the unsplit reader refuses a split layout loudly") {
    import graft.batch.Curation
    val root = Files.createTempDirectory("split_read").toString
    val all = Tables.spread(docs)
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    Curation.curateToShards(corpus, ev, s"$root/out", NShards,
      Curation.Params(splitLedgerDir = Some(s"$root/ledger")))
    val train = Shards.readEpochSplit(spark, s"$root/out", "train", epoch = 0)
    assert(train.select("split").distinct().collect().map(_.getString(0)).toSeq
      == Seq("train"), "a train read must never surface another split")
    // content is exactly the manifest's train set
    val manTrain = spark.read.parquet(s"$root/out/manifest")
      .filter(col("split") === "train")
      .agg(sum(col("n_docs"))).head().getLong(0)
    assert(train.count() == manTrain)
    // different epochs permute, same epoch reproduces
    def order(e: Int) = Shards.readEpochSplit(spark, s"$root/out", "train", e)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order(1) == order(1))
    // the unsplit reader refuses the split layout by name
    val err = intercept[IllegalArgumentException](
      Shards.readEpoch(spark, s"$root/out", epoch = 0))
    assert(err.getMessage.contains("readEpochSplit"), err.getMessage)
    // and an absent split fails loudly, not empty
    val e2 = intercept[IllegalArgumentException](
      Shards.readEpochSplit(spark, s"$root/out", "nosuch", 0))
    assert(e2.getMessage.contains("nosuch"), e2.getMessage)
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
