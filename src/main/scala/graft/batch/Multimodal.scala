package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata structs.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic fake (dimensions derived from payload bytes) — but the
  * Spark-side plumbing is real: binary columns, struct metadata, a
  * frame-sampling generator, and partition-parallel batch processing.
  * The real-codec path would swap `fakeDecode` for a `mapPartitions`
  * call into a native decoder (see graft.stream.MediaPipeline for the
  * typed Dataset variant + tests).
  */
object Multimodal {

  /** qm1: binary payload + derived metadata + md5 content address. */
  def qm1_multimodal(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("content_md5", md5(col("payload")))
      // deterministic fake decode: "image" dims from payload size
      .withColumn("width", (pmod(col("n_bytes"), lit(64)) * 16 + 16).cast("long"))
      .withColumn("height", (pmod(col("n_bytes"), lit(48)) * 16 + 16).cast("long"))
      .withColumn("n_frames", (pmod(col("n_bytes"), lit(7)) + 1).cast("long"))
      .select(col("doc_id"), col("n_bytes"), col("content_md5"),
        col("width"), col("height"), col("n_frames"))
      .orderBy("doc_id")

  /** qm2: frame sampling — explode every k-th frame offset from the
    * fake-decoded frame count (generator over media metadata). */
  def qm2_frame_sample(s: SparkSession, d: String): DataFrame =
    qm1_multimodal(s, d)
      .withColumn("frame", explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))))
      .select(col("doc_id"), col("frame"),
        (col("frame") * col("width") * col("height")).as("byte_offset"))
      .orderBy("doc_id", "frame")

  /** Per-band bucket member cap for [[qm3_phash_neardup]]'s candidate
    * generation — the qd8/qd9 flood guard applied to perceptual
    * hashing: a corpus of near-identical media (one logo served a
    * million times) lands in one band bucket, and without the cap the
    * bucket self-pairs quadratically. Non-binding on the fixtures
    * (max bucket 120 at sf0.1); under flood, output is O(cap²) per
    * bucket and the SAME prefix is encoded in the oracle SQL. */
  private[graft] val PhashBandCap = 128

  /** The 16-bit path's production cap, sized from the MEASURED hot-
    * bucket profile rather than mean occupancy (MediaScaleBench's cap
    * sweep, BASELINE.md r10 row): at 16-bit width mean bucket
    * occupancy stays ≪ any cap, so [[Dedup.occupancyCap]]'s
    * size-from-mean rule floors at the default and what binds is
    * genuine skew — the sweep measured hot distinct-hash buckets up to
    * ~1.7k at the 30× rung, and cap 1024 ≳ that profile bought PERFECT
    * planted completeness at every rung for times within noise of cap
    * 128 (the pair stage is bucket-local m², so only the few hot
    * buckets pay). qm5 carries it so the first-class oracle query runs
    * the full production pin, not just the band width. */
  private[graft] val PhashHotCap = 1024

  /** 32-bit perceptual hash of the media payload, entirely ROW-LOCAL
    * (qd3's zero-shuffle shape): the stub codec's "pixels" are the
    * payload's byte values, block-averaged into 32 equal slices —
    * production swaps the slice averages for decoded image block
    * intensities ([[MediaPipeline.fakeDecode]]'s contract); the
    * thresholding and banding below are codec-independent. Bit b is
    * set when block b's mean intensity exceeds the whole-payload mean
    * — the classic average-hash construction, integer-exact (floor
    * divisions only) so the DuckDB oracle reproduces it bit-for-bit. */
  private[graft] def phash32(docs: DataFrame): DataFrame =
    withPhash(docs.filter(length(col("text")) >= 32))
      .select(col("doc_id"), col("phash"))

  /** The `nBits`-block generalization (32 = [[phash32]] exactly; 64
    * feeds 16-bit banding — see [[phashPairs]]' saturation note).
    * Payloads shorter than `nBits` bytes are unhashable at that
    * resolution and are dropped, like phash32's < 32 rule. */
  private[graft] def phashWide(docs: DataFrame, nBits: Int): DataFrame =
    withPhashN(docs.filter(length(col("text")) >= nBits), nBits)
      .select(col("doc_id"), col("phash"))

  /** Adds a nullable `phash` column to any frame carrying `text` —
    * null when the payload is too short to hash (< 32 bytes). The
    * intermediate block array stays a materialized alias (multi-
    * referenced, so CollapseProject keeps it) — the hash is evaluated
    * once per row, never re-derived inside a lambda (see PLANS.md's
    * single-reference rule). Bit-identical to [[phash32]] for
    * hashable rows (qm3's oracle pins it). */
  private[graft] def withPhash(docs: DataFrame): DataFrame =
    withPhashN(docs, 32)

  /** [[withPhash]] at any block count. Since round 11 this binds the
    * NATIVE fused expression ([[graft.functions.PhashExpr]], SQL
    * `phash_blocks`) — the SQL HOF chain it replaces was the hottest
    * interpreted lambda chain in the 87-query sweep (VERDICT r10's
    * megamorphic-dispatch measurement), and the native form is one
    * allocation-free byte pass inside whole-stage codegen.
    * [[withPhashNSql]] keeps the original chain; PhashExprSpec pins
    * them value-identical per row on the fixture corpus at both
    * production block counts and on randomized payloads. */
  private[graft] def withPhashN(docs: DataFrame, nBits: Int): DataFrame =
    docs.withColumn("phash",
      graft.functions.GraftFunctions.phash_blocks(col("text"), nBits))

  /** The original SQL-HOF form of [[withPhashN]] (32 reproduces
    * [[withPhash]] exactly — the templated SQL is string-identical at
    * nBits = 32). Bit 63 via shiftleft wraps to Long.MinValue, which
    * is the correct two's-complement bit pattern; the sum-accumulate
    * is exact because each bit position contributes once. Kept as the
    * readable spec of what [[graft.functions.PhashExpr]] computes —
    * the equivalence test's oracle side. */
  private[graft] def withPhashNSql(docs: DataFrame, nBits: Int): DataFrame =
    docs
      .withColumn("bs", expr(
        s"IF(length(text) >= $nBits, transform(sequence(0, ${nBits - 1}), b -> named_struct(" +
          s"'i', aggregate(sequence(1, cast(((b + 1) * cast(length(text) as bigint)) div $nBits " +
          s"- (b * cast(length(text) as bigint)) div $nBits as int)), 0L, " +
          s"(acc, p) -> acc + ascii(substring(text, cast((b * cast(length(text) as bigint)) div $nBits + p as int), 1)))," +
          s"'n', ((b + 1) * cast(length(text) as bigint)) div $nBits - (b * cast(length(text) as bigint)) div $nBits)), " +
          "CAST(NULL AS ARRAY<STRUCT<i: BIGINT, n: BIGINT>>))"))
      .withColumn("m", expr(
        "aggregate(bs, 0L, (acc, x) -> acc + x.i) div cast(length(text) as bigint)"))
      .withColumn("phash", expr(
        s"IF(bs IS NULL, CAST(NULL AS BIGINT), aggregate(transform(sequence(0, ${nBits - 1}), b -> " +
          "IF(bs[b].i div bs[b].n > m, shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc + x))"))
      .drop("bs", "m")

  /** qm3: perceptual near-duplicate media — doc pairs whose payload
    * pHashes differ in ≤ 3 of 32 bits. Candidates come from 4 bands
    * of 8 bits: by pigeonhole any pair within Hamming distance 3
    * agrees exactly on at least one band, so banding IS the exact
    * Hamming-ball candidate generator at radius 3 (the band-join form
    * of Similarity's multi-probe bucket walk, scaled to corpus
    * self-join instead of query explosion). Identical hashes collapse
    * to exact-dup GROUPS before banding (within-group pairs need no
    * candidate generation and survive any saturation; member prefix
    * hash-ordered per the eviction-bias rule), the band join runs over
    * DISTINCT hashes with its own capped buckets, and surviving hash
    * pairs verify bit_count(xor) then expand to doc pairs through the
    * capped groups — see the in-body note for the rung measurements
    * that forced this shape.
    *
    * `bandBits` is the SATURATION lever ScaleBench's qm4 measurement
    * exposed: 8-bit bands give only 4 × 256 = 1024 buckets total, so a
    * corpus whose DISTINCT hash count passes ~1024 × cap makes the
    * bucket cap bind on ordinary (non-flood) buckets and cross-group
    * recall decays. At production scale, feed a WIDER hash and band it
    * at 16 bits (4 × 65536 buckets — saturation deferred 256×): the
    * radius-3 pigeonhole guarantee only needs FOUR bands, not any
    * particular width. MediaBandWidthSpec pins the trade; exact-dup
    * (distance-0) recall is width-independent by construction. */
  private[graft] def phashPairs(ph: DataFrame, cap: Int,
      bandBits: Int = 8): DataFrame = {
    // COLLAPSE-THEN-BAND (the r10 rung audit's second finding): real
    // perceptual hashes are heavily skewed — at the 10× rung, 113k
    // frame hashes collapse to 21.5k DISTINCT values and the hottest
    // raw 8-bit band bucket holds 20,659 members against a cap of 128,
    // so a cap on RAW bucket membership silently drops most pairs, at
    // any band width. Exact-dup pairs (identical phash — the dominant
    // duplicate mode) never needed banding at all: a groupBy on the
    // hash yields them linearly, capped per GROUP (hash-ordered,
    // unbiased — the IvfScaleBench eviction-bias rule), at FULL recall
    // regardless of band saturation. The band join then runs over
    // DISTINCT hashes only (7× smaller hot buckets at the rung, and
    // at 16-bit width effectively unsaturated), with its cap on
    // distinct hashes per bucket, md5-ordered; surviving hash pairs
    // verify Hamming 1–3 and expand back to doc pairs through the
    // capped group members. With no cap binding, output is EXACTLY
    // every doc pair within Hamming ≤ 3 — the same contract as
    // before, now with saturation hitting the far smaller distinct
    // space instead of the raw corpus.
    val mem = ph
      .withColumn("g_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("phash")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .filter(col("g_rk") <= cap).drop("g_rk")
      // referenced three times (within-pairs self-join + both
      // expansion sides) — qd2's materialize rule
      .localCheckpoint()
    val within = mem.as("a").join(mem.as("b"),
        col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.phash").as("ph_a"),
        col("b.doc_id").as("id_b"), col("b.phash").as("ph_b"))
      .withColumn("hamming", lit(0L))
    val bands = ph.select(col("phash")).distinct()
      .select(col("phash"), posexplode(expr(
        s"transform(sequence(0, 3), k -> shiftright(phash, cast($bandBits * k as int))" +
          s" & ${(1L << bandBits) - 1}L)")))
      .toDF("phash", "k", "v")
    val pruned = bands.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k", "v")
          .orderBy(md5(col("phash").cast("string")), col("phash"))))
      .filter(col("rk") <= cap)
    val hashPairs = pruned.as("a").join(pruned.as("b"),
        col("a.k") === col("b.k") && col("a.v") === col("b.v")
          && col("a.phash") < col("b.phash"))
      .select(col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct() // a hash pair may collide in several bands
      .withColumn("hamming", expr("cast(bit_count(ha ^ hb) as long)"))
      .filter(col("hamming") <= 3)
    val cross = hashPairs
      .join(mem.select(col("phash").as("ha"), col("doc_id").as("da")), "ha")
      .join(mem.select(col("phash").as("hb"), col("doc_id").as("db")), "hb")
      .select(
        least(col("da"), col("db")).as("id_a"),
        when(col("da") < col("db"), col("ha")).otherwise(col("hb")).as("ph_a"),
        greatest(col("da"), col("db")).as("id_b"),
        when(col("da") < col("db"), col("hb")).otherwise(col("ha")).as("ph_b"),
        col("hamming"))
    within.unionByName(cross).orderBy("id_a", "id_b")
  }

  def qm3_phash_neardup(s: SparkSession, d: String): DataFrame =
    phashPairs(phash32(Tables.spread(Tables.documents(s, d))), PhashBandCap)

  /** qm4: cross-video frame-level near-dup — the video analog of qm3:
    * two "videos" are near-duplicates when their SAMPLED frames (qm2's
    * every-2nd-frame schedule) contain perceptually matching images,
    * even if the files differ byte-wise (re-encodes, watermarks,
    * trims). Each sampled frame's stub payload is a 32-byte slice at
    * its frame offset; frames ride the ENTIRE qm3 machinery — row-local
    * pHash, capped band buckets, Hamming ≤ 3 verify — as synthetic ids
    * `doc_id·64 + frame` (n_frames ≤ 7 < 64, so the encoding is
    * collision-free and ORDER-PRESERVING: frame ids sort by video
    * first, which keeps the band-prefix cap and the pair orientation
    * aligned with the oracle). The per-video-pair rollup counts
    * matching frame pairs and the best distance — the "how much of A
    * is in B" signal a video-dedup reviewer ranks by.
    *
    * Scale shape: identical to qm3 (one band exchange, capped
    * buckets, bucket-local pairs) plus one aggregate over the
    * PAIR-sized result — frames multiply the input by the sampling
    * rate (≤ 4×), never quadratically. */
  def qm4_video_framedup(s: SparkSession, d: String): DataFrame =
    videoFrameDup(Tables.spread(Tables.documents(s, d)))

  /** qm2's sampled-frame schedule sliced into `frameLen`-byte stub
    * payloads under collision-free synthetic frame ids — the input to
    * both band-width regimes of the frame dedup. */
  private[graft] def sampledFrames(docs: DataFrame, frameLen: Int): DataFrame =
    docs
      .withColumn("nb", length(col("text")).cast("long"))
      .withColumn("n_frames", (pmod(col("nb"), lit(7)) + 1).cast("long"))
      .withColumn("frame", explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))))
      .filter(col("nb") >= col("frame") * 8 + frameLen)
      .select((col("doc_id") * 64 + col("frame")).as("doc_id"),
        expr(s"substring(text, cast(1 + frame * 8 as int), $frameLen)").as("text"))

  /** Per-video-pair rollup of frame-level pair hits. */
  private def videoRollup(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("vid_a", expr("id_a div 64"))
      .withColumn("vid_b", expr("id_b div 64"))
      .filter(col("vid_a") < col("vid_b"))
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_frame_pairs"), min(col("hamming")).as("min_hamming"))
      .orderBy("vid_a", "vid_b")

  /** The frame-dedup core over any `(doc_id, text)` frame — separated
    * so MediaPipelineSpec can drive byte-identical synthetic videos
    * (the parquet fixtures hold no exact-dup payloads). */
  private[graft] def videoFrameDup(docs: DataFrame): DataFrame =
    videoRollup(phashPairs(phash32(sampledFrames(docs, 32)), PhashBandCap))

  /** The frame dedup at PRODUCTION band width — 64-byte frame windows
    * hashed at 64 bits and banded at 16 (4 × 65536 buckets): the
    * saturation lever [[phashPairs]]' scaladoc prescribes once the
    * corpus passes ~1024 × cap hashes, which ScaleBench's 10× rung
    * measurement hit (cap binding at ~122 members/bucket, pair output
    * growing only 3× for 10× the frames). Same radius-3 pigeonhole,
    * same rollup; [[graft.MediaScaleBench]] measures both widths side
    * by side at the scale rungs with planted pairs. `cap` is the
    * residual cost↔recall dial on the DISTINCT-hash band space: at
    * 16-bit width mean bucket occupancy stays ≪ the default cap at any
    * realistic corpus (so the mean-occupancy sizing rule of
    * [[Dedup.occupancyCap]] floors at the default and buys nothing
    * here), and what the cap binds on is genuinely hot buckets — size
    * it from the measured bucket profile the bench's cap sweep
    * records, not from the mean. */
  private[graft] def videoFrameDupWide(docs: DataFrame,
      cap: Int = PhashHotCap): DataFrame =
    videoRollup(phashPairs(phashWide(sampledFrames(docs, 64), 64),
      cap, bandBits = 16))

  /** qm5: [[qm4_video_framedup]] at the production band width —
    * oracle-checked so the 16-bit regime is a first-class, hash-pinned
    * query rather than a bench-only lever. Same sampled-frame
    * schedule, 64-byte windows, 64-bit average-hash, 4 × 16-bit bands
    * (65536 buckets each — saturation deferred 256× past qm3/qm4's
    * 8-bit regime, the decay [[graft.MediaScaleBench]] measures at the
    * rungs), the skew-sized [[PhashHotCap]], same radius-3
    * pigeonhole. */
  def qm5_framedup_wide(s: SparkSession, d: String): DataFrame =
    videoFrameDupWide(Tables.spread(Tables.documents(s, d)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qm1_multimodal" -> (qm1_multimodal _),
    "qm2_frame_sample" -> (qm2_frame_sample _),
    "qm3_phash_neardup" -> (qm3_phash_neardup _),
    "qm4_video_framedup" -> (qm4_video_framedup _),
    "qm5_framedup_wide" -> (qm5_framedup_wide _))

  val oracle: Map[String, String] = Map(
    "qm1_multimodal" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_md5,
        | CAST(octet_length(CAST(text AS BLOB)) % 64 * 16 + 16 AS BIGINT) AS width,
        | CAST(octet_length(CAST(text AS BLOB)) % 48 * 16 + 16 AS BIGINT) AS height,
        | CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "qm2_frame_sample" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) % 64 * 16 + 16 AS BIGINT) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 48 * 16 + 16 AS BIGINT) AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
        | FROM documents)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame,
        | CAST(f * width * height AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, width, height, unnest(range(0, n_frames, 2)) AS f FROM m)
        |ORDER BY doc_id, frame""".stripMargin,
    "qm3_phash_neardup" ->
      s"""WITH d AS (
         | SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L
         | FROM documents WHERE length(text) >= 32),
         |blocks AS (
         | SELECT doc_id, text, L, b.b AS b,
         |  (b.b * L) // 32 AS off, ((b.b + 1) * L) // 32 - (b.b * L) // 32 AS n
         | FROM d, range(32) b(b)),
         |inten AS (
         | SELECT doc_id, L, b, n,
         |  list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
         |    p -> ord(substr(text, CAST(off + p AS INT), 1)))) AS i
         | FROM blocks),
         |tot AS (SELECT doc_id, SUM(i) // MAX(L) AS m FROM inten GROUP BY 1),
         |ph AS (
         | SELECT i.doc_id,
         |  CAST(SUM(CASE WHEN i.i // i.n > t.m
         |   THEN 1::BIGINT << i.b ELSE 0::BIGINT END) AS BIGINT) AS phash
         | FROM inten i JOIN tot t ON i.doc_id = t.doc_id GROUP BY 1),
         |gm AS (
         | SELECT doc_id, phash, row_number() OVER (PARTITION BY phash
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS g_rk FROM ph),
         |mem AS (SELECT doc_id, phash FROM gm WHERE g_rk <= $PhashBandCap),
         |within AS (
         | SELECT a.doc_id AS id_a, a.phash AS ph_a,
         |  b.doc_id AS id_b, b.phash AS ph_b, 0::BIGINT AS hamming
         | FROM mem a JOIN mem b ON a.phash = b.phash AND a.doc_id < b.doc_id),
         |bands AS (
         | SELECT phash, k.k AS k, (phash >> CAST(8 * k.k AS INT)) & 255 AS v
         | FROM (SELECT DISTINCT phash FROM ph) dh, range(4) k(k)),
         |pruned AS (
         | SELECT * FROM bands
         | QUALIFY row_number() OVER (PARTITION BY k, v
         |   ORDER BY md5(CAST(phash AS VARCHAR)), phash) <= $PhashBandCap),
         |hp AS (
         | SELECT DISTINCT a.phash AS ha, b.phash AS hb
         | FROM pruned a JOIN pruned b ON a.k = b.k AND a.v = b.v AND a.phash < b.phash
         | WHERE bit_count(xor(a.phash, b.phash)) <= 3),
         |crossp AS (
         | SELECT CASE WHEN ma.doc_id < mb.doc_id THEN ma.doc_id ELSE mb.doc_id END AS id_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.ha ELSE hp.hb END AS ph_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN mb.doc_id ELSE ma.doc_id END AS id_b,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.hb ELSE hp.ha END AS ph_b,
         |  CAST(bit_count(xor(hp.ha, hp.hb)) AS BIGINT) AS hamming
         | FROM hp JOIN mem ma ON ma.phash = hp.ha JOIN mem mb ON mb.phash = hp.hb),
         |allp AS (SELECT * FROM within UNION ALL SELECT * FROM crossp)
         |SELECT id_a, ph_a, id_b, ph_b, hamming FROM allp
         |ORDER BY id_a, id_b""".stripMargin,
    // qm4 = qm2's sampled-frame schedule sliced into 32-byte stub
    // payloads, then qm3's phash/band/cap/verify chain over synthetic
    // frame ids, rolled up per video pair
    "qm4_video_framedup" ->
      s"""WITH v AS (
         | SELECT doc_id, text,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb,
         |  CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
         | FROM documents),
         |d AS (
         | SELECT doc_id * 64 + f AS doc_id,
         |  substr(text, CAST(1 + f * 8 AS INT), 32) AS text, 32::BIGINT AS L
         | FROM (SELECT doc_id, text, nb, unnest(range(0, n_frames, 2)) AS f FROM v)
         | WHERE nb >= f * 8 + 32),
         |blocks AS (
         | SELECT doc_id, text, L, b.b AS b,
         |  (b.b * L) // 32 AS off, ((b.b + 1) * L) // 32 - (b.b * L) // 32 AS n
         | FROM d, range(32) b(b)),
         |inten AS (
         | SELECT doc_id, L, b, n,
         |  list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
         |    p -> ord(substr(text, CAST(off + p AS INT), 1)))) AS i
         | FROM blocks),
         |tot AS (SELECT doc_id, SUM(i) // MAX(L) AS m FROM inten GROUP BY 1),
         |ph AS (
         | SELECT i.doc_id,
         |  CAST(SUM(CASE WHEN i.i // i.n > t.m
         |   THEN 1::BIGINT << i.b ELSE 0::BIGINT END) AS BIGINT) AS phash
         | FROM inten i JOIN tot t ON i.doc_id = t.doc_id GROUP BY 1),
         |gm AS (
         | SELECT doc_id, phash, row_number() OVER (PARTITION BY phash
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS g_rk FROM ph),
         |mem AS (SELECT doc_id, phash FROM gm WHERE g_rk <= $PhashBandCap),
         |within AS (
         | SELECT a.doc_id AS id_a, a.phash AS ph_a,
         |  b.doc_id AS id_b, b.phash AS ph_b, 0::BIGINT AS hamming
         | FROM mem a JOIN mem b ON a.phash = b.phash AND a.doc_id < b.doc_id),
         |bands AS (
         | SELECT phash, k.k AS k, (phash >> CAST(8 * k.k AS INT)) & 255 AS v
         | FROM (SELECT DISTINCT phash FROM ph) dh, range(4) k(k)),
         |pruned AS (
         | SELECT * FROM bands
         | QUALIFY row_number() OVER (PARTITION BY k, v
         |   ORDER BY md5(CAST(phash AS VARCHAR)), phash) <= $PhashBandCap),
         |hp AS (
         | SELECT DISTINCT a.phash AS ha, b.phash AS hb
         | FROM pruned a JOIN pruned b ON a.k = b.k AND a.v = b.v AND a.phash < b.phash
         | WHERE bit_count(xor(a.phash, b.phash)) <= 3),
         |crossp AS (
         | SELECT CASE WHEN ma.doc_id < mb.doc_id THEN ma.doc_id ELSE mb.doc_id END AS id_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.ha ELSE hp.hb END AS ph_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN mb.doc_id ELSE ma.doc_id END AS id_b,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.hb ELSE hp.ha END AS ph_b,
         |  CAST(bit_count(xor(hp.ha, hp.hb)) AS BIGINT) AS hamming
         | FROM hp JOIN mem ma ON ma.phash = hp.ha JOIN mem mb ON mb.phash = hp.hb),
         |allp AS (SELECT * FROM within UNION ALL SELECT * FROM crossp)
         |SELECT id_a // 64 AS vid_a, id_b // 64 AS vid_b,
         | COUNT(*) AS n_frame_pairs,
         | CAST(MIN(hamming) AS BIGINT) AS min_hamming
         |FROM allp
         |WHERE id_a // 64 <> id_b // 64
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // qm5 = qm4's chain at production width: 64-byte frame windows,
    // 64-bit hash (bit 63 is BIGINT's sign bit — DuckDB refuses
    // 1 << 63 as an overflow, so it rides the MIN_BIGINT literal; the
    // arithmetic >> matches Spark's shiftright under the band mask),
    // 16-bit bands
    "qm5_framedup_wide" ->
      s"""WITH v AS (
         | SELECT doc_id, text,
         |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb,
         |  CAST(octet_length(CAST(text AS BLOB)) % 7 + 1 AS BIGINT) AS n_frames
         | FROM documents),
         |d AS (
         | SELECT doc_id * 64 + f AS doc_id,
         |  substr(text, CAST(1 + f * 8 AS INT), 64) AS text, 64::BIGINT AS L
         | FROM (SELECT doc_id, text, nb, unnest(range(0, n_frames, 2)) AS f FROM v)
         | WHERE nb >= f * 8 + 64),
         |blocks AS (
         | SELECT doc_id, text, L, b.b AS b,
         |  (b.b * L) // 64 AS off, ((b.b + 1) * L) // 64 - (b.b * L) // 64 AS n
         | FROM d, range(64) b(b)),
         |inten AS (
         | SELECT doc_id, L, b, n,
         |  list_sum(list_transform(range(1, CAST(n + 1 AS INT)),
         |    p -> ord(substr(text, CAST(off + p AS INT), 1)))) AS i
         | FROM blocks),
         |tot AS (SELECT doc_id, SUM(i) // MAX(L) AS m FROM inten GROUP BY 1),
         |ph AS (
         | SELECT i.doc_id,
         |  CAST(SUM(CASE WHEN i.i // i.n > t.m
         |   THEN CASE WHEN i.b = 63 THEN (-9223372036854775808)::BIGINT
         |        ELSE 1::BIGINT << i.b END
         |   ELSE 0::BIGINT END) AS BIGINT) AS phash
         | FROM inten i JOIN tot t ON i.doc_id = t.doc_id GROUP BY 1),
         |gm AS (
         | SELECT doc_id, phash, row_number() OVER (PARTITION BY phash
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS g_rk FROM ph),
         |mem AS (SELECT doc_id, phash FROM gm WHERE g_rk <= $PhashHotCap),
         |within AS (
         | SELECT a.doc_id AS id_a, a.phash AS ph_a,
         |  b.doc_id AS id_b, b.phash AS ph_b, 0::BIGINT AS hamming
         | FROM mem a JOIN mem b ON a.phash = b.phash AND a.doc_id < b.doc_id),
         |bands AS (
         | SELECT phash, k.k AS k, (phash >> CAST(16 * k.k AS INT)) & 65535 AS v
         | FROM (SELECT DISTINCT phash FROM ph) dh, range(4) k(k)),
         |pruned AS (
         | SELECT * FROM bands
         | QUALIFY row_number() OVER (PARTITION BY k, v
         |   ORDER BY md5(CAST(phash AS VARCHAR)), phash) <= $PhashHotCap),
         |hp AS (
         | SELECT DISTINCT a.phash AS ha, b.phash AS hb
         | FROM pruned a JOIN pruned b ON a.k = b.k AND a.v = b.v AND a.phash < b.phash
         | WHERE bit_count(xor(a.phash, b.phash)) <= 3),
         |crossp AS (
         | SELECT CASE WHEN ma.doc_id < mb.doc_id THEN ma.doc_id ELSE mb.doc_id END AS id_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.ha ELSE hp.hb END AS ph_a,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN mb.doc_id ELSE ma.doc_id END AS id_b,
         |  CASE WHEN ma.doc_id < mb.doc_id THEN hp.hb ELSE hp.ha END AS ph_b,
         |  CAST(bit_count(xor(hp.ha, hp.hb)) AS BIGINT) AS hamming
         | FROM hp JOIN mem ma ON ma.phash = hp.ha JOIN mem mb ON mb.phash = hp.hb),
         |allp AS (SELECT * FROM within UNION ALL SELECT * FROM crossp)
         |SELECT id_a // 64 AS vid_a, id_b // 64 AS vid_b,
         | COUNT(*) AS n_frame_pairs,
         | CAST(MIN(hamming) AS BIGINT) AS min_hamming
         |FROM allp
         |WHERE id_a // 64 <> id_b // 64
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
