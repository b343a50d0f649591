package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard output: the last mile of the curation pipeline —
  * after quality/dedup/mixture/packing, the corpus must land on disk
  * as a FIXED, REPRODUCIBLE set of shards a data loader can stream,
  * resume, and re-shuffle per epoch without touching the bytes.
  *
  * The reference's terminal stage is row-at-a-time INSERTs into SQL
  * Server tables (Prensas.py:315-365); the corpus-curation analog is
  * bulk shard files plus a manifest. Design:
  *
  *   - assignment: `shard = bin % nShards` over [[TextOps.docBins]]'
  *     prefix bins. Bins are cap-token blocks of one global
  *     deterministic order, so round-robin over bins balances shards
  *     to within one bin of tokens each — no size-estimation pass, no
  *     RNG, engine-independent (the qt12 oracle states it in SQL).
  *   - layout: one directory per shard (hive `shard=` partitioning),
  *     rows sorted by (bin, doc_id) within each shard so a reader
  *     streams bins in packing order and two writes of the same
  *     corpus are file-for-file identical.
  *   - manifest: one row per shard (bins, docs, tokens, id checksum)
  *     written beside the shards — the loader's integrity check and
  *     the resume ledger, derived from the SAME assignment frame that
  *     fed the write.
  *
  * At 100 TB: the narrow (doc_id, tok) frame pays the two-pass prefix
  * sum (no global window — PackingSpec), the payload joins back on
  * doc_id ONCE, and the shard exchange moves each row once; nothing
  * funnels through a single task (ShardsSpec pins determinism and
  * balance; the epoch ordering below never touches data at all).
  */
object Shards {

  /** Per-doc shard assignment: `(doc_id, tok, bin)` → `+ shard`. */
  def assign(binned: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, s"shards.assign: nShards must be positive, got $nShards")
    binned.withColumn("shard", pmod(col("bin"), lit(nShards.toLong)))
  }

  /** One row per shard: `(shard, n_bins, n_docs, n_tokens,
    * sum_doc_ids)` — the loader-side integrity contract. */
  def manifest(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(countDistinct(col("bin")).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy("shard")

  /** Write `payload` (any frame with a `doc_id` column) as training
    * shards under `dir`: `dir/shards/shard=N/` parquet sorted by
    * (bin, doc_id), plus `dir/manifest/`. The payload joins the
    * narrow assignment on doc_id once; docs the packer never binned
    * (absent from `binned`) are dropped — the packer's output IS the
    * corpus contract. */
  def write(payload: DataFrame, binned: DataFrame, nShards: Int,
            dir: String): Unit = {
    val assigned = assign(binned, nShards)
      // feeds the payload join and the manifest; one derivation
      .localCheckpoint()
    val spark = payload.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two-phase like EmbedIngest's requantize: drop the marker first so
    // a crash mid-overwrite reads as "no committed shard set", never as
    // a silently mixed old/new layout
    fs.delete(new org.apache.hadoop.fs.Path(dir, CommitMarker), false)
    payload.join(assigned, Seq("doc_id"))
      .repartition(nShards, col("shard"))
      // the sort MUST lead with the dynamic-partition column: the file
      // writer's required ordering is (partition cols); any other
      // prefix makes it inject its own shard-only (unstable) sort and
      // the (bin, doc_id) stream order is lost
      .sortWithinPartitions(col("shard"), col("bin"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$dir/shards")
    manifest(assigned).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
    fs.create(new org.apache.hadoop.fs.Path(dir, CommitMarker), true).close()
  }

  /** One row per (split, shard): [[manifest]] with the split ledger's
    * dimension — the loader-side contract of a split-tagged corpus
    * (round-14 verdict #3): a training run opens ONLY train shards and
    * verifies their counts without deriving anything. */
  def manifestSplits(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("split"), col("shard"))
      .agg(countDistinct(col("bin")).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        sum(col("doc_id")).as("sum_doc_ids"))
      .orderBy("split", "shard")

  /** [[write]] for a split-tagged corpus: `binned` carries a `split`
    * column ([[Curation.splitBins]] — bins never straddle splits), the
    * layout is `dir/shards/split=S/shard=N/` (hive-partitioned on
    * BOTH, so a loader's train-only read prunes to the train
    * directories with zero data movement), and the manifest is
    * per (split, shard). Same determinism rule as [[write]]: the sort
    * leads with the dynamic-partition columns, so two writes of the
    * same corpus are file-for-file identical. */
  def writeSplits(payload: DataFrame, binned: DataFrame, nShards: Int,
      dir: String): Unit = {
    require(binned.columns.contains("split"),
      "writeSplits needs a split column on the binned frame — use write for unsplit corpora")
    val assigned = assign(binned, nShards).localCheckpoint()
    val spark = payload.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, CommitMarker), false)
    payload.join(assigned, Seq("doc_id"))
      .repartition(nShards, col("split"), col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col("bin"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("split", "shard")
      .parquet(s"$dir/shards")
    manifestSplits(assigned).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
    fs.create(new org.apache.hadoop.fs.Path(dir, CommitMarker), true).close()
  }

  private val CommitMarker = "_GRAFT_COMMIT"

  /** Deterministic per-epoch shard read order — multi-epoch training
    * re-shuffles by PERMUTING SHARD ORDER, never rewriting data: rank
    * shards by the content-addressed md5 of (epoch, shard). Pure
    * driver-side arithmetic over nShards entries. */
  def epochOrder(nShards: Int, epoch: Int): Seq[Int] = {
    require(nShards > 0, s"shards.epochOrder: nShards must be positive, got $nShards")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nShards).sortBy { sh =>
      md.digest(s"$epoch|$sh".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
  }

  /** Open one epoch's corpus in its epoch order: the shard column is
    * hive partition metadata, so the reader prunes to each shard
    * directory in turn with zero data movement. */
  def readEpoch(spark: SparkSession, dir: String, epoch: Int): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(dir, CommitMarker)),
      s"shards at $dir have no commit marker — the writing run did not finish")
    val man = spark.read.parquet(s"$dir/manifest")
    require(!man.columns.contains("split"),
      s"shards at $dir are split-tagged — use readEpochSplit(split) so a " +
        "training read can never mix eval shards in")
    val nShards = man.count().toInt
    val shards = spark.read.parquet(s"$dir/shards")
    epochOrder(nShards, epoch)
      .map(sh => shards.filter(col("shard") === sh))
      .reduce(_ unionAll _)
  }

  /** [[readEpoch]] for a split-tagged layout ([[writeSplits]]): open
    * ONE split's shards in the epoch order — the training loader's
    * entry (`split = "train"`), with both hive partition columns
    * pruning the read to that split's shard directories. The epoch
    * permutation is over the split's own shard ids, so two splits
    * shuffle independently. */
  def readEpochSplit(spark: SparkSession, dir: String, split: String,
      epoch: Int): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(dir, CommitMarker)),
      s"shards at $dir have no commit marker — the writing run did not finish")
    val man = spark.read.parquet(s"$dir/manifest")
    require(man.columns.contains("split"),
      s"shards at $dir are not split-tagged — use readEpoch")
    val shardIds = man.filter(col("split") === split)
      .select(col("shard").cast("long")).collect().map(_.getLong(0)).sorted
    require(shardIds.nonEmpty,
      s"shards at $dir hold no '$split' split (manifest has none)")
    val shards = spark.read.parquet(s"$dir/shards").filter(col("split") === split)
    // permute the split's own shard-id list content-addressedly — the
    // same md5 rank rule as epochOrder, applied to the actual ids
    val md = java.security.MessageDigest.getInstance("MD5")
    shardIds.sortBy(sh =>
        md.digest(s"$epoch|$sh".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .map(sh => shards.filter(col("shard") === sh))
      .reduce(_ unionAll _)
  }
}
