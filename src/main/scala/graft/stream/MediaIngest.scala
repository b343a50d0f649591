package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.batch.Multimodal

/** Perceptual near-dup filtering of a media payload column at ingest —
  * the third membrane, giving the binary modality what [[IngestDedup]]
  * gives text and [[EmbedIngest]] gives embeddings: a doc is rejected
  * when its payload's 32-bit perceptual hash (qm3's row-local
  * average-hash over the stub codec's block intensities) is within
  * Hamming distance `maxHamming` of a batch-mate's or an admitted
  * doc's.
  *
  * Candidate generation is qm3's exact Hamming-ball banding: 4 bands,
  * a pair within distance 3 shares ≥ 1 exact band value by pigeonhole
  * (the guarantee needs four bands, not any particular width). At the
  * 8-bit default the band-key space is 4 × 256 = 1024 TOTAL, so the
  * pushed-IN index probe is bounded by a CONSTANT (≤ 1024 literals)
  * at any batch size — but that same small space is the SATURATION
  * ceiling ScaleBench measured (past ~1024 × bucket-size hashes,
  * every probe touches O(corpus/1024) index rows per bucket). The
  * `bandBits = 16` configuration (64-bit hash, 4 × 65536 buckets)
  * defers saturation 256×; its probe IN is batch-bounded instead of
  * constant, so past the trickle limit the IN is skipped and the
  * map-side broadcast band join carries the probe — the text
  * membrane's regime split. The width is pinned per store
  * ([[checkBandBits]]); a mismatch would silently miss every key.
  * The index rows matching the probed buckets join against the
  * (micro-batch-bounded) broadcast band set and verify the exact
  * distance with `bit_count(xor)` map-side; the index is scanned,
  * never shuffled, and never grows a row per duplicate (only admitted
  * docs extend it). Bulk backfills past the broadcast limit fall back
  * to a plain shuffle join they amortize.
  *
  * Exactly-once state mirrors the sibling membranes: the index is
  * hive-partitioned by epoch, written OVERWRITE into `epoch=N`, probed
  * at `epoch < N`, and folded on the shared compact cadence.
  *
  * In-batch semantics: exact-hash dups collapse to the min doc_id
  * first (so a flood of identical payloads never pairs), then the
  * remaining distinct hashes pair per band bucket with the distance
  * verify — bounded by the micro-batch, the membrane's unit of work.
  * Payloads too short to hash (< 32 bytes) pass the membrane
  * unfiltered, like shingle-less docs in the text membrane. */
object MediaIngest {

  private[graft] val DefaultMaxHamming = 3

  /** Band keys of a phash: (k << bits) | band_k, k = 0..3 — one int
    * per band; 4 × 2^bits possible values total (1024 at the 8-bit
    * default). `bits` is the saturation lever
    * [[graft.batch.Multimodal.phashPairs]] documents: at 8-bit bands a
    * corpus past ~1024 × typical-bucket-size makes every probe touch
    * O(corpus / 1024) index rows per bucket; 16-bit bands (with the
    * matching 64-bit hash) defer that 256×. The width is PINNED per
    * store ([[checkBandBits]]) — probing an index with a different
    * width than it was written with would silently miss every key. */
  private def bandCol(bits: Int) = expr(
    s"transform(sequence(0, 3), k -> cast(shiftleft(k, $bits) as int) + " +
      s"cast(shiftright(phash, cast($bits * k as int)) & ${(1L << bits) - 1}L as int))")

  /** Hash width matching a band width: 4 bands always cover the hash
    * (the radius-3 pigeonhole needs exactly four). */
  private def hashBits(bandBits: Int) = 4 * bandBits

  /** First toucher pins the store's band width in a marker file; every
    * later writer AND prober must present the same width — a mismatch
    * would silently miss every index key (different bk encoding), the
    * unacceptable failure. Hadoop FS API so object stores work like
    * the EpochFold markers. */
  private[graft] def checkBandBits(s: SparkSession, dir: String, bits: Int): Unit = {
    require(bits == 8 || bits == 16, s"bandBits must be 8 or 16, got $bits")
    val p = new org.apache.hadoop.fs.Path(s"$dir/media_idx_bits")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val pinned = try scala.io.Source.fromInputStream(in).mkString.trim
                   finally in.close()
      require(pinned == bits.toString,
        s"media store $dir is pinned to $pinned-bit bands; probing/writing " +
          s"with $bits-bit bands would silently miss every key")
    } else {
      // a marker-less store with existing index data predates widths
      // and was necessarily written at 8
      require(bits == 8 || !EpochFold.hasDataFiles(s, s"$dir/media_idx"),
        s"media store $dir predates band widths (8-bit); cannot adopt it at $bits")
      fs.mkdirs(p.getParent)
      val out = fs.create(p, false)
      try out.write(bits.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** The batch rows that survive the perceptual membrane (all original
    * columns). `mediaCol` must be a string payload column (the stub
    * codec convention of qm1 — a real deployment feeds decoded block
    * intensities through the same hash). */
  private[graft] def survivors(batch: DataFrame, dir: String, epochId: Long,
      mediaCol: String = "media",
      maxHamming: Int = DefaultMaxHamming,
      bandBits: Int = 8): DataFrame = {
    val s = batch.sparkSession
    checkBandBits(s, dir, bandBits)
    val ph = Multimodal.phashWide(
      batch.select(col("doc_id"), col(mediaCol).as("text")), hashBits(bandBits))
    val keyed = batch.join(ph, Seq("doc_id"), "left")
      .localCheckpoint() // one micro-batch; probed + filtered below
    val hashed = keyed.filter(col("phash").isNotNull)

    // 1. exact-hash dups collapse to the min doc_id (floods of
    // identical payloads never reach pairwise work)
    val firstPerHash = hashed.groupBy(col("phash")).agg(min(col("doc_id")).as("doc_id"))
    val exactFresh = hashed.join(firstPerHash, Seq("phash", "doc_id"))
    val bands = exactFresh.select(col("doc_id"), col("phash"),
        explode(bandCol(bandBits)).as("bk"))
      .localCheckpoint() // batch-bounded; feeds in-batch pairs + probe

    // 2. in-batch near-dup: distinct hashes pair per band bucket,
    // verified at the exact distance (batch-bounded work)
    val a = bands.as("a"); val b = bands.as("b")
    val inBatch = a.join(b, col("a.bk") === col("b.bk")
        && col("b.doc_id") < col("a.doc_id"))
      .filter(expr(s"bit_count(a.phash ^ b.phash) <= $maxHamming"))
      .select(col("a.doc_id").as("doc_id")).distinct()

    // 3. vs corpus: bounded IN pushed to the index scan — constant
    // (≤ 1024 keys) at 8-bit bands; at 16-bit the distinct band set is
    // batch-bounded instead, so past the trickle limit the IN is
    // skipped and the (still map-side) broadcast band join carries the
    // probe alone, mirroring the text membrane's regime split.
    // Distance is verified map-side either way.
    val corpusHits = readIfExists(s, s"$dir/media_idx") match {
      case Some(idx0) =>
        val idx = if (idx0.columns.contains("epoch"))
          idx0.filter(col("epoch") < epochId) else idx0
        val batchRows = exactFresh.count()
        if (batchRows > IngestDedup.broadcastKeyLimit(s))
          idx.select(col("bk"), col("phash").as("c_phash"))
            .join(bands, Seq("bk"))
            .filter(expr(s"bit_count(phash ^ c_phash) <= $maxHamming"))
            .select(col("doc_id")).distinct()
        else {
          // distinct band keys ≤ min(4·batch, 4·2^bits): at 8-bit the
          // band space itself bounds the IN at 1024 literals for ANY
          // batch; at 16-bit the IN is only worth pushing while the
          // batch keeps it under the trickle limit
          val bkUpper = math.min(4 * batchRows, 4L << bandBits)
          val pre =
            if (bkUpper <= IngestDedup.isinKeyLimit(s)) {
              val bks = bands.select("bk").distinct()
                .collect().map(_.getInt(0)).toSeq
              if (bks.isEmpty) idx.limit(0)
              else idx.filter(col("bk").isin(bks: _*))
            } else idx
          pre.select(col("bk"), col("phash").as("c_phash"))
            .join(broadcast(bands), Seq("bk"))
            .filter(expr(s"bit_count(phash ^ c_phash) <= $maxHamming"))
            .select(col("doc_id")).distinct()
        }
      case None => s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
    }

    val keepIds = exactFresh
      .join(inBatch.union(corpusHits).distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .union(keyed.filter(col("phash").isNull).select(col("doc_id")))
    batch.join(keepIds, Seq("doc_id"))
  }

  /** `(doc_id, dup_of, reason)` attribution for this stage's
    * rejections — `batch` is the stage INPUT (the text survivors in
    * the composed pipeline), `keep` its output. Computed POST-HOC over
    * the rejected set only, like [[IngestDedup.rejectionLedger]]:
    * [[survivors]]' plan is untouched and the extra work is sized by
    * the rejection count. First match wins: `media_batch` (the
    * smallest batch-mate inside the Hamming ball — covers the
    * exact-hash collapse, distance 0) then `media_corpus` (the
    * smallest admitted owner from the index; its probe IN is bounded
    * by the REJECTED band set, ≤ min(4·rejections, 4·2^bits) literals,
    * skipped past the trickle limit like [[survivors]]' probe). A
    * dup_of may name a batch-mate a LATER membrane rejects —
    * [[MultimodalIngest]] resolves cross-membrane chains before the
    * write. */
  private[graft] def rejectionLedger(batch: DataFrame, dir: String,
      epochId: Long, keep: DataFrame, mediaCol: String = "media",
      maxHamming: Int = DefaultMaxHamming, bandBits: Int = 8): DataFrame = {
    val s = batch.sparkSession
    val rejected = batch.select(col("doc_id"))
      .join(keep.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint() // batch-bounded; drives every probe below
    import s.implicits._
    val emptyLedger =
      Seq.empty[(Long, Option[Long], String)].toDF("doc_id", "dup_of", "reason")
    if (rejected.isEmpty) return emptyLedger

    val bands = Multimodal.phashWide(
        batch.select(col("doc_id"), col(mediaCol).as("text")), hashBits(bandBits))
      .select(col("doc_id"), col("phash"), explode(bandCol(bandBits)).as("bk"))
      .localCheckpoint() // witness side + probe side below
    val rejBands = bands.join(rejected, Seq("doc_id")).localCheckpoint()
    // in-batch: smallest batch-mate within the Hamming ball (an
    // unhashable payload is never rejected, so every rejected doc has
    // band rows here)
    val inBatch = rejBands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("b.doc_id") < col("a.doc_id"))
      .filter(expr(s"bit_count(a.phash ^ b.phash) <= $maxHamming"))
      .groupBy(col("a.doc_id")).agg(min(col("b.doc_id")).as("dup_of"))
      .select(col("doc_id"), col("dup_of"), lit("media_batch").as("reason"))
    val rem = rejBands
      .join(inBatch.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val corpusAttr = readIfExists(s, s"$dir/media_idx") match {
      case Some(idx0) =>
        val idx = if (idx0.columns.contains("epoch"))
          idx0.filter(col("epoch") < epochId) else idx0
        val nRej = rejected.count()
        val pre =
          if (math.min(4 * nRej, 4L << bandBits) <= IngestDedup.isinKeyLimit(s)) {
            val bks = rem.select(col("bk")).distinct()
              .collect().map(_.getInt(0)).toSeq
            if (bks.isEmpty) idx.limit(0)
            else idx.filter(col("bk").isin(bks: _*))
          } else idx
        pre.select(col("bk"), col("phash").as("c_phash"),
            col("doc_id").as("dup_src"))
          .join(broadcast(rem), Seq("bk"))
          .filter(expr(s"bit_count(phash ^ c_phash) <= $maxHamming"))
          .groupBy(col("doc_id")).agg(min(col("dup_src")).as("dup_of"))
          .select(col("doc_id"), col("dup_of"), lit("media_corpus").as("reason"))
      case None => emptyLedger
    }
    val attributed = inBatch.unionByName(corpusAttr)
    val unattributed = rejected
      .join(attributed.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(null).cast("long").as("dup_of"),
        lit("unknown").as("reason")) // can't-happen guard, loud in specs
    attributed.unionByName(unattributed)
  }

  /** The index rows for a set of ADMITTED docs — one (bk, phash,
    * doc_id) row per band per distinct hash the admitted set carries.
    * Unhashable payloads contribute no rows ([[Multimodal.phashWide]]
    * drops them before hashing). Sorted by bk so the bounded IN probe
    * skips row groups. */
  private[graft] def indexRows(admitted: DataFrame, mediaCol: String,
      bandBits: Int = 8): DataFrame =
    Multimodal.phashWide(
        admitted.select(col("doc_id"), col(mediaCol).as("text")), hashBits(bandBits))
      .select(col("doc_id"), col("phash"), explode(bandCol(bandBits)).as("bk"))
      .select(col("bk"), col("phash"), col("doc_id"))
      .sortWithinPartitions("bk")

  /** Standalone one-batch pass (composition inside
    * [[MultimodalIngest.ingestBatch]] writes the index itself so only
    * fully-admitted docs extend it). Same epoch contract as
    * [[IngestDedup.ingestBatch]]. */
  def ingestBatch(batch: DataFrame, dir: String, epochId: Long,
      mediaCol: String = "media",
      maxHamming: Int = DefaultMaxHamming, bandBits: Int = 8): Unit = {
    val keep = survivors(batch, dir, epochId, mediaCol, maxHamming, bandBits)
      .localCheckpoint()
    keep.write.mode(SaveMode.Overwrite).parquet(s"$dir/corpus/epoch=$epochId")
    indexRows(keep, mediaCol, bandBits)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/media_idx/epoch=$epochId")
  }

  /** Fold index epochs `< upTo` on the shared cadence (same contract
    * as [[IngestDedup.compactIndexes]]). */
  def compact(s: SparkSession, dir: String, upTo: Long,
      targetBytes: Long = 128L * 1024 * 1024): Unit =
    // the shared maintenance fence (FsLease.guarded, round 14)
    graft.batch.FsLease.guarded(s, dir, "MediaIngest: maintenance") {
      EpochFold.fold(s, s"$dir/media_idx", upTo, targetBytes, Seq("bk"))
      EpochFold.fold(s, s"$dir/corpus", upTo, targetBytes)
    }

  private def readIfExists(s: SparkSession, path: String): Option[DataFrame] =
    if (EpochFold.hasDataFiles(s, path)) Some(s.read.parquet(path)) else None
}
