package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.batch.Dedup

/** Dedup-at-ingest: the streaming form of qd1 (exact) + qd2 (near-dup)
  * for an incrementally built training corpus.
  *
  * Every micro-batch of arriving documents is:
  *  1. exact-deduped within the batch (first doc_id wins per content);
  *  2. exact-deduped against the accumulated corpus (anti join on the
  *     content hash index);
  *  3. near-dup-filtered within the batch and against the corpus's LSH
  *     band index — signatures are computed ROW-LOCALLY
  *     ([[Dedup.bandKeys]]), so the stream side needs no aggregation
  *     and the probe is a plain join;
  *  4. survivors are appended to the corpus, and their keys extend both
  *     indexes — later batches see them.
  *
  * State lives on disk as two parquet key tables (content hash; band
  * keys), not in the state store: corpus-lifetime dedup state is
  * unbounded by design, which is exactly what the streaming state store
  * is wrong for. At 100 TB the two indexes become bucketed/Delta tables
  * (the anti joins then co-locate by key); the call shape is unchanged.
  *
  * Exactly-once on plain parquet, by epoch-partitioned idempotence: all
  * three tables are hive-partitioned by the foreachBatch epoch id, each
  * epoch's output is written with OVERWRITE into its own `epoch=N`
  * partition, and every index probe filters to `epoch < N`. A replayed
  * epoch therefore (a) recomputes against exactly the pre-N index state
  * — any half-written epoch-N keys are invisible to the probe — and
  * (b) overwrites whatever partial epoch-N output the crash left, so
  * re-running converges to the same corpus with no duplicate rows. (A
  * transactional MERGE sink gets this for free; this is the same
  * commit-by-partition idea expressed on files.)
  */
object IngestDedup {

  /** Start the ingest query. `docs` must have `doc_id` (long) and
    * `text` columns; appends survivors under `dir/corpus` and keys
    * under `dir/exact_idx`, `dir/band_idx`. */
  def start(docs: DataFrame, dir: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    docs.writeStream.trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) => ingestBatch(batch, dir, id) }
      .start()

  private def readIfExists(s: SparkSession, path: String): Option[DataFrame] = {
    // Hadoop FS, not java.io.File: the indexes live wherever the lake
    // does (HDFS/object store on a cluster), and a local-only existence
    // check there would silently report "no index yet" forever
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(s.read.parquet(path)) else None
  }

  /** One micro-batch pass; also callable on a plain batch DataFrame
    * (backfill and streaming share the exact code path). Backfill
    * callers must supply strictly increasing `epochId`s — it is the
    * partition the pass overwrites and the replay-idempotence key. */
  def ingestBatch(batch: DataFrame, dir: String, epochId: Long = 0L): Unit = {
    val s = batch.sparkSession
    val keyed = batch
      .withColumn("content_key", md5(col("text").cast("binary")))
      .withColumn("bands", Dedup.bandKeys(col("text")))
      .localCheckpoint() // small (one micro-batch); read multiple times below

    // 1. exact within batch: min doc_id per content wins (deterministic)
    val firstPerContent = keyed.groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exactInBatch = keyed.join(firstPerContent, Seq("content_key", "doc_id"))

    // 2. exact vs corpus index (epochs strictly before this one: a
    // replayed epoch must not see its own half-committed keys)
    val exactFresh = readIfExists(s, s"$dir/exact_idx") match {
      case Some(idx) =>
        exactInBatch.join(idx.filter(col("epoch") < epochId), Seq("content_key"), "left_anti")
      case None => exactInBatch
    }

    // 3a. near-dup within batch: a doc loses iff a SMALLER doc_id in
    // this batch shares any band (the canonical-min rule of qd6)
    val bk = exactFresh.select(col("doc_id"), explode(col("bands")).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint()
    val losers = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") > col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id")).distinct()
    // 3b. near-dup vs corpus band index (same epoch < N visibility rule)
    val corpusHits = readIfExists(s, s"$dir/band_idx") match {
      case Some(idx) => bk.join(idx.filter(col("epoch") < epochId), Seq("band", "key"))
        .select("doc_id").distinct()
      case None => s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    }
    val keep = exactFresh
      .join(losers.union(corpusHits).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint() // consumed by three writes below

    // 4. commit survivors + index keys into this epoch's partitions.
    // OVERWRITE of the epoch dir is the idempotence point: a replay
    // replaces any partial output instead of appending next to it.
    keep.drop("bands", "content_key")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/corpus/epoch=$epochId")
    keep.select(col("content_key"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/exact_idx/epoch=$epochId")
    keep.select(explode(col("bands")).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"))
      .filter(col("key").isNotNull) // shingle-less docs have no signature
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/band_idx/epoch=$epochId")
  }
}
