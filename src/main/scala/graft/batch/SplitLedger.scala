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
  * Layout under `dir`:
  *   - `ledger_vN/` — parquet (doc_id, split) for version N;
  *   - `meta.json` — `{"ver":N}`, the single commit point: [[assign]]
  *     writes the NEXT version's parquet first and flips meta last, so
  *     a crash mid-write leaves the prior version live and the partial
  *     dir is simply overwritten by the next attempt (IvfIndex's
  *     generation discipline, without the multi-dir rename dance — one
  *     dir per version, written before it is ever referenced).
  *     Version N−1 is retired after the flip (one-version grace for
  *     lazy readers, self-healing sweep for crash-skipped retirements).
  *
  * Scale shape: one id-join of the corpus membership against the
  * ledger, one per-cluster min-priority aggregate, one cluster-join
  * back ([[Dedup.stickySplits]]); the ledger itself is (doc_id, split)
  * — two narrow columns, linear in corpus history. Reference analog:
  * the keyed-state stickiness of active_records (Prensas.py:703-741).
  */
object SplitLedger {

  private def metaPath(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
  private def versionDir(dir: String, ver: Long) = s"$dir/ledger_v$ver"

  // all IO through the Hadoop FS layer, like the IvfIndex layout, so
  // the ledger works wherever Spark can write (hdfs://, s3a://, file:)
  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The committed version, 0 when the ledger has never assigned.
    * meta.json is written via temp + rename (below), so it is never
    * half-written; the self-healing fallback for a missing or
    * unparseable one (a crash inside the rename window, or manual
    * damage) is the highest ledger_vN that parquet COMMITTED (its
    * `_SUCCESS` marker) — never a throw that bricks the ledger until
    * manual repair (round-14 ADVICE). */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    if (!fs.exists(metaPath(dir))) return maxCommitted(fs, dir)
    val txt =
      try {
        val in = fs.open(metaPath(dir))
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: java.io.IOException => "" } // damaged → fallback
    """"ver"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(maxCommitted(fs, dir))
  }

  /** Highest version whose parquet write committed (`_SUCCESS`),
    * 0 when none has. A version past the meta'd one can only be the
    * one an interrupted [[assign]] was about to flip to — fully
    * written by construction (the flip is meta-LAST). */
  private def maxCommitted(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return 0L
    fs.listStatus(root).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("ledger_v") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        n.stripPrefix("ledger_v").toLongOption
      else None
    }.foldLeft(0L)(math.max)
  }

  /** The committed assignment (doc_id, split), None before the first
    * [[assign]]. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val ver = currentVersion(spark, dir)
    if (ver == 0L) None
    else Some(spark.read.parquet(versionDir(dir, ver)))
  }

  /** The cross-version migration audit — per (prior_split, split)
    * transition counts between the committed version and the one
    * before it (which the grace retirement keeps on disk for exactly
    * this): the ops-facing check that every move went TOWARD train.
    * `n_docs` includes docs new in the current version
    * (prior_split = null). Fails loudly before two versions exist. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    val ver = currentVersion(spark, dir)
    require(ver >= 2, s"SplitLedger.audit needs two committed versions at $dir (have $ver)")
    val cur = spark.read.parquet(versionDir(dir, ver))
    val prev = spark.read.parquet(versionDir(dir, ver - 1))
      .withColumnRenamed("split", "prior_split")
    cur.join(prev, Seq("doc_id"), "left")
      .groupBy(col("prior_split"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("prior_split"), col("split"))
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
    val ver = currentVersion(spark, dir)
    val prior = if (ver == 0L) None else Some(spark.read.parquet(versionDir(dir, ver)))
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
    // retained: recorded docs not in this version keep their entry
    val next = prior match {
      case Some(l) => cur.unionByName(
        l.join(members.select(col("doc_id")), Seq("doc_id"), "left_anti"))
      case None => cur
    }
    next.write.mode(SaveMode.Overwrite).parquet(versionDir(dir, ver + 1))
    // the writes above are the unbounded part — re-stamp the lease so
    // a TTL overrun fails loudly HERE instead of flipping meta under a
    // usurper's feet
    FsLease.renewOrFail(spark, dir, "SplitLedger: assign commit")
    commitMeta(spark, fs, dir, ver + 1)
    // grace retirement: keep ver (the replaced version) for lazy
    // readers, sweep everything older — self-healing like IvfIndex's
    val root = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("ledger_v") &&
          n.stripPrefix("ledger_v").toLongOption.exists(_ < ver))
        require(fs.delete(st.getPath, true),
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
      dir: String, ver: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.meta.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"ver":$ver}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(metaPath(dir)))
      require(fs.delete(metaPath(dir), false),
        s"SplitLedger: could not retire old $dir/meta.json")
    require(fs.rename(tmp, metaPath(dir)),
      s"SplitLedger: could not install $dir/meta.json from $tmp")
  }
}
