package graft.batch

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors).
  *
  * - qs1: brute-force cosine top-k — the exactness baseline. The query
  *   set is broadcast so candidate scoring is a map-side operation over
  *   the (huge) candidate side: no shuffle of the corpus at 100 TB,
  *   only of the tiny per-query top-k heaps.
  * - qs2: LSH-bucketed ANN — 8 deterministic ±1 random-hyperplane
  *   signs → 256 buckets; candidates share the query's bucket, so the
  *   pair space is ~1/256 of brute force. Bucketing is a plain
  *   shuffle-by-bucket join: the 1000-executor scale path.
  *
  * Numeric policy: dot products fold left-to-right over the array in
  * DOUBLE (deterministic); cosines are rounded to 6 dp BEFORE ranking
  * so Spark and the DuckDB oracle rank identical values.
  *
  * Calibration: bucket counts are corpus-density decisions. 8
  * hyperplanes (256 buckets) targets ≥ millions of vectors; over the
  * 500-2000-vector fixtures it deliberately over-partitions (low
  * global recall, maximal pruning), which the oracle still checks
  * exactly. On a real corpus tune planes ≈ log2(n / desired bucket
  * size) and add multi-probe for recall; same for the IVF centroid
  * sampling rate.
  */
object Similarity {

  private val Dim = 64
  private val Planes = 8

  /** ±1 hyperplane weights from md5 parity — reproducible in SQL:
    * weight(p, i) = +1 iff first hex digit of md5("p|i") is even. */
  private[batch] def weight(p: Int, i: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$p|$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if ((Character.digit(hex.charAt(0), 16) % 2) == 0) 1.0 else -1.0
  }

  // native codegen dot product — bit-identical to the former
  // aggregate(zip_with(...)) composition (same left-to-right IEEE adds,
  // so rounded-6dp oracle hashes are unchanged), ~10× less per-pair
  // overhead in the all-pairs/bucket probes
  private[batch] def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, b)

  private[batch] def norm2(a: Column): Column =
    graft.functions.GraftFunctions.vec_dot(a, a)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(norm2(col("embedding"))))

  /** qs1: brute-force cosine top-3 for sampled query vectors. */
  def qs1_knn_bruteforce(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d))
    val q = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val joined = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("rcos").desc, col("vec_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"), col("rcos"))
      .orderBy("qid", "rank")
  }

  /** Sign bits for all hyperplanes → bucket id column (0..2^planes-1). */
  private def bucketCol(dim: Int = Dim, planes: Int = Planes): Column = {
    val bits = (0 until planes).map { p =>
      val ws = typedLit((0 until dim).map(i => weight(p, i)))
      val proj = round(graft.functions.GraftFunctions.vec_dot(col("embedding"), ws), 6)
      when(proj >= 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  // ------------------------------------------------------- library API
  // The qs* queries above are oracle-calibrated instances of these two
  // generic entry points over any (vec_id: long, embedding: array) frame.

  /** Global top-k per query through the native
    * [[graft.plans.GroupTopKPlan]] operator: a map-side bounded-heap
    * partial before the shuffle (≤ k narrow triples per partition per
    * query cross the wire), heap merge + rank after — no sort, no full
    * candidate shuffle. */
  private def rankTopK(cand: DataFrame, k: Int): DataFrame =
    graft.plans.GroupTopK.topK(
      cand.select(col("qid").cast("long"), col("vec_id").cast("long"),
        col("rcos").cast("double")),
      keys = Seq("qid"),
      order = Seq(col("rcos").desc, col("vec_id").asc), k = k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"), col("rcos"))

  /** Exact top-k cosine neighbors of each query vector (queries must be
    * broadcast-small). The corpus VECTORS never move: scoring is a
    * map-side pass over the corpus scan, and only per-candidate
    * (qid, id, score) triples — pre-reduced to ≤ k per partition per
    * query by [[rankTopK]]'s native GroupTopK — reach the ranking
    * shuffle. Output: (qid, rank, neighbor_id, rcos). */
  def knnTopK(emb: DataFrame, queryIds: DataFrame, k: Int): DataFrame = {
    val corpus = withNorm(emb)
    val q = corpus.join(queryIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val joined = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    rankTopK(joined, k)
  }

  /** Approximate top-k via random-hyperplane LSH: candidates come from
    * the query's bucket, so the pair space shrinks ~2^planes-fold. Tune
    * planes ≈ log2(corpus / desired bucket size); recall depends on
    * corpus clusteredness (SimilaritySpec measures it on a clustered
    * synthetic corpus).
    *
    * `multiProbe = true` additionally probes every bucket at Hamming
    * distance 1 from the query's (single-bit flips): planes+1 buckets
    * instead of 1, recovering neighbors that fell just across one
    * hyperplane. Candidate volume grows ×(planes+1) but stays
    * ~(planes+1)/2^planes of brute force — the standard
    * recall-vs-probe-cost dial. The corpus side is untouched (still one
    * bucket per vector, one shuffle by bucket); only the query side
    * explodes. Same output shape as [[knnTopK]]. */
  def annTopK(emb: DataFrame, queryIds: DataFrame, dim: Int, planes: Int, k: Int,
      multiProbe: Boolean = false): DataFrame = {
    // a wrong `dim` would null every projection and silently collapse
    // all vectors into bucket 0 (quadratic in-bucket join) — fail loudly
    val checkedBucket = when(size(col("embedding")) === dim, bucketCol(dim, planes))
      .otherwise(raise_error(concat(
        lit(s"annTopK: dim=$dim but embedding has "), size(col("embedding")),
        lit(" elements"))).cast("long"))
    val corpus = withNorm(emb).withColumn("bucket", checkedBucket)
    val q0 = corpus.join(queryIds, Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val q = if (!multiProbe) q0 else q0.withColumn("qbucket", explode(expr(
      s"concat(array(qbucket), transform(sequence(0, ${planes - 1}), p -> qbucket ^ shiftleft(1L, p)))")))
    val cand = q.join(corpus, col("qbucket") === col("bucket") && col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    rankTopK(cand, k)
  }

  /** qs2: ANN via random-hyperplane LSH buckets; top-1 in-bucket
    * neighbor per query (left join keeps queries with empty buckets). */
  def qs2_ann_lsh(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d)).withColumn("bucket", bucketCol())
    val q = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val cand = q.join(emb, col("qbucket") === col("bucket") && col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    val w = Window.partitionBy("qid").orderBy(col("rcos").desc, col("vec_id").asc)
    val best = cand.withColumn("rank", row_number().over(w)).filter(col("rank") === 1)
      .groupBy(col("qid")).agg(first(col("vec_id")).as("best_id"), first(col("rcos")).as("best_rcos"))
    val nc = cand.groupBy(col("qid")).agg(count(lit(1)).as("n_candidates"))
    q.select(col("qid"), col("qbucket").cast("long").as("bucket"))
      .join(nc, Seq("qid"), "left").join(best, Seq("qid"), "left")
      .select(col("qid"), col("bucket"), coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_id"), col("best_rcos"))
      .orderBy("qid")
  }

  /** qs3: IVF-style ANN — a deterministic centroid subset (every 100th
    * vector) acts as the coarse quantizer; every vector is assigned to
    * its nearest centroid (rounded cosine, centroid-id tiebreak) and a
    * query probes only its own cell. At 100 TB the assignment is a
    * broadcast map-side pass and the probe is a shuffle on cell id —
    * candidates shrink by ~1/centroids vs brute force. */
  def qs3_ivf_ann(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d))
    val cents = emb.filter(pmod(col("vec_id"), lit(100)) === 7)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    // assign every vector to its nearest centroid — IvfIndex's row-local
    // argmax fold over one broadcast row holding the quantizer (no N×C
    // row explosion, no vec_id exchange; oracle states it as the
    // crossJoin+window form, which the fold is tie-break-identical to)
    val assigned = emb.crossJoin(broadcast(IvfIndex.centroidArray(cents)))
      .withColumn("cell", IvfIndex.bestCell(col("embedding"), col("nrm"), rounded = true))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val q = assigned.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell").as("qcell"))
    val cand = q.join(assigned, col("qcell") === col("cell") && col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    val wBest = Window.partitionBy("qid").orderBy(col("rcos").desc, col("vec_id").asc)
    val best = cand.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .groupBy(col("qid")).agg(first(col("vec_id")).as("best_id"), first(col("rcos")).as("best_rcos"))
    val nc = cand.groupBy(col("qid")).agg(count(lit(1)).as("n_candidates"))
    q.select(col("qid"), col("qcell").as("cell"))
      .join(nc, Seq("qid"), "left").join(best, Seq("qid"), "left")
      .select(col("qid"), col("cell"), coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_id"), col("best_rcos"))
      .orderBy("qid")
  }

  /** qs4: the [[annTopK]] multi-probe path as an oracle query — top-3
    * per query over the home bucket plus all Hamming-1 buckets, checked
    * against the same probe expansion computed in DuckDB. */
  def qs4_ann_multiprobe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queryIds = emb.filter(pmod(col("vec_id"), lit(100)) === 0).select("vec_id")
    annTopK(emb, queryIds, Dim, Planes, k = 3, multiProbe = true)
      .orderBy("qid", "rank")
  }

  /** qs5: ANN recall audit — the quality loop a production similarity
    * index needs: measure the IVF path (qs3's single-cell probe)
    * against brute-force ground truth (qs1's exact top-3) on the same
    * sampled query set, reported per embedding label. `n_hit_at_1` =
    * the IVF best-1 IS the exact nearest neighbor; `n_hit_in_3` = it
    * appears anywhere in the exact top-3; `n_candidates` = how much of
    * the corpus the probe actually scored (the recall/cost trade both
    * numbers parameterize). At 100 TB the ground-truth side is the
    * expensive one — which is why the query set is a ~1% sample (the
    * standard recall-audit design: exact answers for a sliver, indexed
    * answers for everything); both sides reuse the broadcast/map-side
    * shapes of their parents unchanged. */
  def qs5_ann_recall(s: SparkSession, d: String): DataFrame = {
    val exact = qs1_knn_bruteforce(s, d)
    val approx = qs3_ivf_ann(s, d)
    val labels = Tables.embeddings(s, d)
      .select(col("vec_id").as("qid"), col("label"))
    val hits = approx.as("a")
      .join(exact.as("x"),
        col("a.qid") === col("x.qid") && col("a.best_id") === col("x.neighbor_id"),
        "left")
      .select(col("a.qid").as("qid"), col("a.n_candidates").as("n_candidates"),
        when(col("x.rank") === 1, 1L).otherwise(0L).as("hit1"),
        when(col("x.rank").isNotNull, 1L).otherwise(0L).as("hit3"))
    hits.join(labels, Seq("qid"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("hit1")).as("n_hit_at_1"),
        sum(col("hit3")).as("n_hit_in_3"),
        sum(col("n_candidates")).as("n_candidates"))
      .orderBy("label")
  }

  /** qs6: int8 scalar quantization of the embedding store + fidelity
    * audit — the storage lever a 100 TB embedding corpus pulls first
    * (4 bytes → 1 byte per dimension, the standard serving-store
    * compression): per-vector symmetric scale max|x|/127,
    * q = floor(x/scale + 0.5) — the explicit floor-plus-half form so
    * both engines round identically (never `round()`, whose half-case
    * mode differs cross-engine), |q| ≤ 127 by construction (the
    * max_abs_q column PROVES the clamp is never needed), dequantized
    * fidelity = round(cos(q·scale, x), 6). Output per label: vector
    * count, Σq checksum (integer-exact — pins every quantized value),
    * the |q| ceiling, and how many vectors reconstruct at cosine ≥
    * 0.999. All cross-engine aggregates are integers; floats are
    * row-local and 6-dp-rounded (qt9's rule). Zero vectors (scale 0)
    * are unquantizable and excluded in both engines.
    *
    * Scale shape: entirely row-local until one label-sized aggregate —
    * a single map-side pass over the store, no shuffle beyond the
    * 10-row summary; at 100 TB this runs as the compaction pass that
    * rewrites the store (same plan + a write instead of the audit). */
  def qs6_int8_quant(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .withColumn("xd", expr("transform(embedding, v -> cast(v as double))"))
      .withColumn("scale", expr("array_max(transform(xd, v -> abs(v))) / 127"))
      .filter(col("scale") > 0)
      .withColumn("q", expr("transform(xd, v -> cast(floor(v / scale + 0.5d) as bigint))"))
      .withColumn("dq", expr("transform(q, v -> v * scale)"))
      .withColumn("rcos", expr(
        "round(aggregate(zip_with(dq, xd, (a, b) -> a * b), 0d, (acc, v) -> acc + v) / " +
          "(sqrt(aggregate(zip_with(dq, dq, (a, b) -> a * b), 0d, (acc, v) -> acc + v)) * " +
          "sqrt(aggregate(zip_with(xd, xd, (a, b) -> a * b), 0d, (acc, v) -> acc + v))), 6)"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("aggregate(q, 0L, (acc, v) -> acc + v)")).as("sum_q"),
        max(expr("array_max(transform(q, v -> abs(v)))")).as("max_abs_q"),
        sum(when(col("rcos") >= 0.999, 1L).otherwise(0L)).as("n_hi_fidelity"))
      .orderBy("label")
  }

  // ---- the PRODUCTION persisted-index search configuration (qs7) ----
  // The recall-critical constants the round-11 AnnScaleBench rung audit
  // settled: q = 2 multi-assignment (each vector stored in its 2
  // nearest cells — the layout change that made planted-twin recall
  // flat across the 1×→30× rungs, BASELINE.md), p = 5 probes (the
  // probe width every embedding membrane uses). Named vals so
  // tools/check_caps.py attributes them to qs7's oracle.
  private[graft] val IndexAssign = 2
  private[graft] val SearchProbes = 5
  // qs8's int8→float rescore funnel width: the int8 scores pick the
  // top-RescoreCap candidates per query, the float pass re-ranks only
  // those. Sized ≳3× k so a quantization reorder inside the funnel
  // cannot change the final top-k (AnnScaleBench's int8 arm measures
  // the planted-twin recall consequence at the rungs).
  private[graft] val RescoreCap = 10

  /** Deterministic per-dataset scratch dir for persisted-index queries:
    * same input dir → same index path, so steady-state bench reps
    * overwrite rather than accumulate. Root defaults to the driver's
    * tmpdir (correct for local[*]); on a REAL cluster set
    * `spark.graft.indexScratch` to a shared filesystem path — the
    * index is written by executors and read back partition-pruned, so
    * a driver-local path would break the moment tasks run off-box
    * (IvfIndex's meta/centroids/cells all ride the Hadoop FS layer, so
    * hdfs://…/scratch works unchanged). */
  private def indexDir(s: SparkSession, tag: String, d: String): String = {
    val h = MessageDigest.getInstance("MD5").digest(d.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val root = s.conf.getOption("spark.graft.indexScratch")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    // applicationId keeps the path deterministic WITHIN a session
    // (steady bench reps overwrite, as intended) while two concurrent
    // JVMs on the same dataset (CI spec + a bench run) can never race
    // Overwrite builds of one shared dir
    s"$root/graft_${tag}_${h}_${s.sparkContext.applicationId}"
  }

  /** qs7: the production ANN search shape, oracle-gated end to end —
    * [[IvfIndex.build]] at the round-11-audited recall configuration
    * (q = [[IndexAssign]] multi-assignment, `C = ⌈√N⌉` md5-sampled
    * centroids — both sizing rules computed from the data in BOTH
    * engines, qd16's pattern) followed by [[IvfIndex.search]] at
    * p = [[SearchProbes]] probes over the PERSISTED hive-partitioned
    * cell layout, so the hash-exact gate covers exactly what a
    * production query runs: partition-pruned cell reads (IvfIndexSpec
    * pins the PartitionFilters), the broadcast-quantizer native probe,
    * the multi-assign triple dedupe, and the native GroupTopK ranking.
    * Until this round that configuration lived only in
    * AnnScaleBench/IvfIndexSpec; every other production pin (qd16, qm5,
    * qc4) already had a first-class green row. Reference anchor: the
    * scan-coalescing hand-optimization (Prensas.py:201, 505-509) — read
    * only what the index prunes to, never the whole corpus. */
  def qs7_ivf_search(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val dir = indexDir(s, "qs7", d)
    IvfIndex.build(emb, dir, nCells, assign = IndexAssign)
    val queryVecs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    IvfIndex.search(s, dir, queryVecs, k = 3, nProbe = SearchProbes)
      .orderBy("qid", "rank")
  }

  /** qs8: the int8-quantized index store, searched end to end — the
    * storage-side sequel to qs6 (which proved quantization fidelity but
    * had no consumer) and the 4×-IO variant of qs7: [[IvfIndex.build]]
    * with `int8 = true` persists cells as 1-byte-per-dim binary blobs
    * (no float embedding on disk), [[IvfIndex.searchInt8]] scores
    * candidates with the exact INTEGER dot, funnels the top
    * [[RescoreCap]] per query into a float rescore against the
    * source-of-truth corpus, and emits the float top-3. The result
    * carries `idot`, the raw integer int8 score — integer-exact across
    * engines, so the oracle pins the quantized scoring path itself,
    * not just the funnel's membership. Same q/p/C sizing as qs7. */
  def qs8_int8_search(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val dir = indexDir(s, "qs8", d)
    IvfIndex.build(emb, dir, nCells, assign = IndexAssign, int8 = true)
    val queryVecs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    IvfIndex.searchInt8(s, dir, queryVecs, emb,
      k = 3, nProbe = SearchProbes, rescore = RescoreCap)
      .orderBy("qid", "rank")
  }

  /** qs9: FILTERED vector search — qs7's persisted-index shape with a
    * metadata predicate (`label = 3`, ~10% selective on the fixture)
    * resolved INSIDE the index: [[IvfIndex.build]] carries the label
    * column into the cell layout (`attrs = Seq("label")`) and
    * [[IvfIndex.search]] applies the predicate to the cells read
    * itself, so it reaches the parquet scan as a pushed filter on top
    * of the partition pruning and the candidate set is thinned BEFORE
    * ranking — every query still fills k ranks with matching vectors.
    * The production alternative orderings both fail at scale:
    * post-filtering the top-k under-fills it whenever a winner misses
    * the predicate, and joining a corpus attribute table against
    * candidates re-shuffles the corpus per query batch. Every vector
    * store grew this operator (attribute-gated ANN); training-data
    * curation uses it as "nearest LICENSED/ENGLISH/held-out neighbor".
    * Probes stay [[SearchProbes]]: with ~10% of each cell matching,
    * recall wants the p-first rule (see [[IvfIndex.search]] scaladoc);
    * the oracle pins the exact filtered semantics rather than a recall
    * target. */
  /** qs10: the ROUTED low-selectivity filtered search, oracle-gated —
    * qs9's persisted-index shape with a 1%-selective id predicate and
    * a truthful `selectivityHint = 0.01`: below the derived floor
    * p·q/C ([[IvfIndex.search]]'s routing rule, measured by
    * AnnScaleBench's selsweep arm) the probe stage is skipped and
    * every matching row is scored exactly, so this gate pins the
    * routed path's exact brute-force-over-filtered semantics — the
    * multi-assign cell dedupe and the (rcos DESC, vec_id) tie rule
    * included. The oracle additionally encodes the routing
    * PRECONDITION (0.01 < p·q/⌈√N⌉) as a gate CTE: if the floor ever
    * moves below the hint, the gate empties and the compare fails
    * loudly instead of silently diffing a probe result against
    * brute-force SQL. */
  def qs10_routed_search(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val dir = indexDir(s, "qs10", d)
    IvfIndex.build(emb, dir, nCells, assign = IndexAssign)
    val queryVecs = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
    IvfIndex.search(s, dir, queryVecs, k = 3, nProbe = SearchProbes,
      where = Some(pmod(col("vec_id"), lit(100)) === 3),
      selectivityHint = Some(0.01))
      .orderBy("qid", "rank")
  }

  def qs9_filtered_search(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val n = emb.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val dir = indexDir(s, "qs9", d)
    IvfIndex.build(emb, dir, nCells, assign = IndexAssign, attrs = Seq("label"))
    val queryVecs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    IvfIndex.search(s, dir, queryVecs, k = 3, nProbe = SearchProbes,
      where = Some(col("label") === 3))
      .orderBy("qid", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qs9_filtered_search" -> (qs9_filtered_search _),
    "qs10_routed_search" -> (qs10_routed_search _),
    "qs1_knn_bruteforce" -> (qs1_knn_bruteforce _),
    "qs2_ann_lsh" -> (qs2_ann_lsh _),
    "qs3_ivf_ann" -> (qs3_ivf_ann _),
    "qs4_ann_multiprobe" -> (qs4_ann_multiprobe _),
    "qs5_ann_recall" -> (qs5_ann_recall _),
    "qs6_int8_quant" -> (qs6_int8_quant _),
    "qs7_ivf_search" -> (qs7_ivf_search _),
    "qs8_int8_search" -> (qs8_int8_search _))

  /** SQL fragment: dot product of two list columns in double — the
    * list_transform form, NOT a correlated `(SELECT SUM … FROM range)`
    * subquery: ~4× faster in DuckDB at identical values (both
    * accumulate in index order), which is what keeps the heavy
    * oracles checkable at the ScaleGen rungs. */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range($Dim), i -> CAST($a[CAST(i AS INT) + 1]" +
      s" AS DOUBLE) * CAST($b[CAST(i AS INT) + 1] AS DOUBLE)))"

  /** Shared LSH-bucket prologue for the qs2/qs4 oracles (weights →
    * norms → projections → buckets → bucketed corpus `e`) — one
    * fragment so a calibration change cannot desynchronize them. */
  private val bucketSql =
    s"""w(p, i, wt) AS (
       | SELECT p.p, i.i,
       |  CASE WHEN ('0x' || substr(md5(p.p || '|' || i.i), 1, 1))::INT % 2 = 0
       |       THEN 1.0 ELSE -1.0 END
       | FROM range($Planes) p(p), range($Dim) i(i)),
       |nm AS (
       | SELECT vec_id, embedding,
       |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
       |        FROM range($Dim) i(i))) AS nrm
       | FROM embeddings),
       |proj AS (
       | SELECT e.vec_id, w.p,
       |  round(SUM(CAST(e.embedding[w.i + 1] AS DOUBLE) * w.wt), 6) AS pr
       | FROM nm e, w GROUP BY 1, 2),
       |bk AS (
       | SELECT vec_id,
       |  CAST(SUM(CASE WHEN pr >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       | FROM proj GROUP BY 1),
       |e AS (SELECT nm.vec_id, nm.embedding, nm.nrm, bk.bucket
       |      FROM nm JOIN bk ON nm.vec_id = bk.vec_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    // qs7: the persisted-index production search, restated from the
    // embeddings table: C = ceil(sqrt(N)) md5-ranked centroids (qd16's
    // sizing-from-data pattern), every vector assigned to its
    // IndexAssign nearest cells, each query probing its SearchProbes
    // nearest, DISTINCT over the multi-assign∩multi-probe candidate
    // pairs, exact top-3 by (rcos DESC, vec_id). The oracle never sees
    // the on-disk layout — determinism of the sample/assignment rules
    // makes the persisted path and this restatement agree hash-exactly.
    // The cn/nrm > 0 guard mirrors the native probe's NaN EXCLUSION: a
    // zero-norm vector or centroid scores NaN in Spark and vanishes
    // from assignment and probes, while DuckDB would rank its NaN
    // crcos FIRST under ORDER BY DESC — fixture-absent today, but the
    // restatement must not depend on that (same guard in qs8).
    // qs8: qs7's index restated over the int8 store — every vector's q
    // list re-derived with qs6's quantization rule, candidates scored
    // by the INTEGER dot (CAST to BIGINT: DuckDB sums BIGINT lists into
    // HUGEINT), the rounded dequantized score funnels RescoreCap
    // survivors per query, float rescore picks the top 3. The emitted
    // idot column is the integer int8 score itself — hash-exact with
    // no float-order caveat (qs6's Σq trick applied to search).
    "qs8_int8_search" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |st AS (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS nc FROM nm),
         |cents AS (
         | SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM nm, st
         | QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= nc),
         |cscored AS (
         | SELECT nm.vec_id, cents.cid,
         |  round(${sqlDot("cents.ce", "nm.embedding")} / (cents.cn * nm.nrm), 6) AS crcos
         | FROM nm, cents
         | WHERE cents.cn > 0 AND nm.nrm > 0),
         |qt AS (
         | SELECT vec_id,
         |  list_transform(xd, v -> CAST(floor(v / scale + 0.5) AS BIGINT)) AS qv, scale
         | FROM (
         |  SELECT vec_id, xd,
         |   list_max(list_transform(xd, v -> abs(v))) / 127 AS scale
         |  FROM (SELECT vec_id,
         |         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
         |        FROM embeddings) raw) scaled
         | WHERE scale > 0),
         |assigned AS (
         | SELECT cs.vec_id, cs.cid AS cell FROM cscored cs JOIN qt ON cs.vec_id = qt.vec_id
         | QUALIFY row_number() OVER (PARTITION BY cs.vec_id
         |   ORDER BY cs.crcos DESC, cs.cid ASC) <= $IndexAssign),
         |probes AS (
         | SELECT cs.vec_id AS qid, cs.cid AS cell FROM cscored cs JOIN qt ON cs.vec_id = qt.vec_id
         | WHERE cs.vec_id % 100 = 0
         | QUALIFY row_number() OVER (PARTITION BY cs.vec_id
         |   ORDER BY cs.crcos DESC, cs.cid ASC) <= $SearchProbes),
         |cand AS (
         | SELECT DISTINCT p.qid, a.vec_id
         | FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid),
         |i8 AS (
         | SELECT c.qid, c.vec_id,
         |  CAST(list_sum(list_transform(range($Dim),
         |    i -> qa.qv[CAST(i AS INT) + 1] * qb.qv[CAST(i AS INT) + 1])) AS BIGINT) AS idot,
         |  qa.scale AS qscale, qb.scale AS cscale
         | FROM cand c JOIN qt qa ON c.qid = qa.vec_id JOIN qt qb ON c.vec_id = qb.vec_id),
         |funnel AS (
         | SELECT i8.qid, i8.vec_id, i8.idot FROM i8
         |  JOIN nm q ON i8.qid = q.vec_id JOIN nm v ON i8.vec_id = v.vec_id
         | QUALIFY row_number() OVER (PARTITION BY i8.qid
         |   ORDER BY round(CAST(i8.idot AS DOUBLE) * i8.qscale * i8.cscale
         |     / (q.nrm * v.nrm), 6) DESC, i8.vec_id ASC) <= $RescoreCap),
         |rescored AS (
         | SELECT f.qid, f.vec_id, f.idot,
         |  round(${sqlDot("q.embedding", "v.embedding")} / (q.nrm * v.nrm), 6) AS rcos
         | FROM funnel f JOIN nm q ON f.qid = q.vec_id JOIN nm v ON f.vec_id = v.vec_id)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, idot, rcos FROM (
         | SELECT qid, vec_id, idot, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM rescored) t
         |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin,
    // qs9: qs7's restatement with the label predicate applied to the
    // CORPUS side before ranking — exactly where the engine applies it
    // (the filtered cells scan thins candidates pre-top-k). Queries are
    // NOT filtered; assignment ranks are per-vector, so filtering
    // after the QUALIFY is identical to filtering the corpus first.
    // Since round 15 the statement is ROUTED like the engine is
    // (verdict #6): `route` computes the SAME selectivity the index
    // derives from its recorded attr stats (the exact label = 3
    // fraction) and the same p·q/⌈√N⌉ floor, and each rung takes the
    // branch the engine takes — brute (exact over the filtered corpus)
    // below the floor, probes above it. On the sf0.01 fixture the
    // floor is 10/23 ≈ 0.43 and the ~10% filter routes BRUTE; at the
    // ScaleGen rungs ⌈√N⌉ grows past 100 and the same query routes
    // back to probes — both sides of the auto-router are oracle-gated.
    "qs9_filtered_search" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding, label,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |st AS (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS nc FROM nm),
         |route AS (
         | SELECT CASE WHEN
         |   CAST(SUM(CASE WHEN label = 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         |   < $SearchProbes.0 * $IndexAssign / (SELECT nc FROM st)
         |  THEN 1 ELSE 0 END AS brute
         | FROM nm),
         |cents AS (
         | SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM nm, st
         | QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= nc),
         |cscored AS (
         | SELECT nm.vec_id, nm.label, cents.cid,
         |  round(${sqlDot("cents.ce", "nm.embedding")} / (cents.cn * nm.nrm), 6) AS crcos
         | FROM nm, cents
         | WHERE cents.cn > 0 AND nm.nrm > 0),
         |assigned AS (
         | SELECT vec_id, label, cid AS cell FROM cscored
         | QUALIFY row_number() OVER (PARTITION BY vec_id
         |   ORDER BY crcos DESC, cid ASC) <= $IndexAssign),
         |probes AS (
         | SELECT vec_id AS qid, cid AS cell FROM cscored WHERE vec_id % 100 = 0
         | QUALIFY row_number() OVER (PARTITION BY vec_id
         |   ORDER BY crcos DESC, cid ASC) <= $SearchProbes),
         |cand AS (
         | SELECT DISTINCT p.qid, a.vec_id
         | FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid
         | WHERE a.label = 3),
         |scored AS (
         | SELECT c.qid, c.vec_id,
         |  round(${sqlDot("q.embedding", "v.embedding")} / (q.nrm * v.nrm), 6) AS rcos
         | FROM cand c JOIN nm q ON c.qid = q.vec_id JOIN nm v ON c.vec_id = v.vec_id),
         |bscored AS (
         | SELECT q.vec_id AS qid, m.vec_id,
         |  round(${sqlDot("q.embedding", "m.embedding")} / (q.nrm * m.nrm), 6) AS rcos
         | FROM (SELECT * FROM nm WHERE vec_id % 100 = 0) q
         | CROSS JOIN (SELECT * FROM nm WHERE label = 3) m
         | WHERE m.vec_id <> q.vec_id)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM scored) t
         |CROSS JOIN route WHERE rn <= 3 AND route.brute = 0
         |UNION ALL
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM bscored) t
         |CROSS JOIN route WHERE rn <= 3 AND route.brute = 1
         |ORDER BY qid, rank""".stripMargin,
    // qs10: exact brute force over the filtered corpus — what the
    // routed path computes; `gate` states the routing precondition
    // with the same p/q constants the engine's floor derives from
    "qs10_routed_search" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt(${sqlDot("embedding", "embedding")}) AS nrm
         | FROM embeddings),
         |gate AS (
         | SELECT 1 AS g
         | WHERE 0.01 < $SearchProbes.0 * $IndexAssign / ceil(sqrt((SELECT COUNT(*) FROM nm)))),
         |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM nm
         |      WHERE vec_id % 25 = 0),
         |m AS (SELECT vec_id, embedding, nrm FROM nm WHERE vec_id % 100 = 3),
         |scored AS (
         | SELECT q.qid, m.vec_id,
         |  round(${sqlDot("q.qe", "m.embedding")} / (q.qn * m.nrm), 6) AS rcos
         | FROM q CROSS JOIN m CROSS JOIN gate WHERE m.vec_id <> q.qid)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM scored) t
         |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin,
    "qs7_ivf_search" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |st AS (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS nc FROM nm),
         |cents AS (
         | SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM nm, st
         | QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= nc),
         |cscored AS (
         | SELECT nm.vec_id, cents.cid,
         |  round(${sqlDot("cents.ce", "nm.embedding")} / (cents.cn * nm.nrm), 6) AS crcos
         | FROM nm, cents
         | WHERE cents.cn > 0 AND nm.nrm > 0),
         |assigned AS (
         | SELECT vec_id, cid AS cell FROM cscored
         | QUALIFY row_number() OVER (PARTITION BY vec_id
         |   ORDER BY crcos DESC, cid ASC) <= $IndexAssign),
         |probes AS (
         | SELECT vec_id AS qid, cid AS cell FROM cscored WHERE vec_id % 100 = 0
         | QUALIFY row_number() OVER (PARTITION BY vec_id
         |   ORDER BY crcos DESC, cid ASC) <= $SearchProbes),
         |cand AS (
         | SELECT DISTINCT p.qid, a.vec_id
         | FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.qid),
         |scored AS (
         | SELECT c.qid, c.vec_id,
         |  round(${sqlDot("q.embedding", "v.embedding")} / (q.nrm * v.nrm), 6) AS rcos
         | FROM cand c JOIN nm q ON c.qid = q.vec_id JOIN nm v ON c.vec_id = v.vec_id)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM scored) t
         |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin,
    // qs6: quantize → dequantize → fidelity, restated in DuckDB list
    // lambdas. Multiplication ORDER matters for bit-exactness: both
    // engines compute (q·scale)·x and (q·scale)·(q·scale) left to
    // right, and both list sums accumulate in index order.
    "qs6_int8_quant" ->
      s"""WITH x AS (
         | SELECT vec_id, label,
         |  list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
         | FROM embeddings),
         |s AS (
         | SELECT vec_id, label, xd,
         |  list_max(list_transform(xd, v -> abs(v))) / 127 AS scale
         | FROM x),
         |q AS (
         | SELECT vec_id, label, xd, scale,
         |  list_transform(xd, v -> CAST(floor(v / scale + 0.5) AS BIGINT)) AS qv
         | FROM s WHERE scale > 0),
         |r AS (
         | SELECT label, qv,
         |  round(list_sum(list_transform(range($Dim), i -> (qv[CAST(i AS INT) + 1] * scale) * xd[CAST(i AS INT) + 1]))
         |   / (sqrt(list_sum(list_transform(range($Dim), i -> (qv[CAST(i AS INT) + 1] * scale) * (qv[CAST(i AS INT) + 1] * scale))))
         |    * sqrt(list_sum(list_transform(range($Dim), i -> xd[CAST(i AS INT) + 1] * xd[CAST(i AS INT) + 1])))), 6) AS rcos
         | FROM q)
         |SELECT label, COUNT(*) AS n_vecs,
         | CAST(SUM(list_sum(qv)) AS BIGINT) AS sum_q,
         | CAST(MAX(list_max(list_transform(qv, v -> abs(v)))) AS BIGINT) AS max_abs_q,
         | CAST(SUM(CASE WHEN rcos >= 0.999 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_fidelity
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "qs3_ivf_ann" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM nm
         |          WHERE vec_id % 100 = 7),
         |scored AS (
         | SELECT nm.vec_id, cents.cid,
         |  round(${sqlDot("cents.ce", "nm.embedding")} / (cents.cn * nm.nrm), 6) AS crcos
         | FROM nm, cents),
         |assigned AS (
         | SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY crcos DESC, cid ASC) AS rn FROM scored) t WHERE rn = 1),
         |av AS (SELECT nm.vec_id, nm.embedding, nm.nrm, assigned.cell
         |       FROM nm JOIN assigned ON nm.vec_id = assigned.vec_id),
         |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, cell AS qcell
         |      FROM av WHERE vec_id % 100 = 0),
         |cand AS (
         | SELECT q.qid, q.qcell, c.vec_id,
         |  round(${sqlDot("q.qe", "c.embedding")} / (q.qn * c.nrm), 6) AS rcos
         | FROM q JOIN av c ON q.qcell = c.cell AND c.vec_id <> q.qid),
         |best AS (
         | SELECT qid, vec_id AS best_id, rcos AS best_rcos FROM (
         |  SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rcos DESC, vec_id ASC) AS rn FROM cand) t WHERE rn = 1),
         |nc AS (SELECT qid, COUNT(*) AS n_candidates FROM cand GROUP BY 1)
         |SELECT q.qid, q.qcell AS cell, COALESCE(nc.n_candidates, 0) AS n_candidates,
         | best.best_id, best.best_rcos
         |FROM q LEFT JOIN nc ON q.qid = nc.qid LEFT JOIN best ON q.qid = best.qid
         |ORDER BY q.qid""".stripMargin,
    "qs1_knn_bruteforce" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM nm WHERE vec_id % 100 = 0),
         |scored AS (
         | SELECT q.qid, c.vec_id,
         |  round(${sqlDot("q.qe", "c.embedding")} / (q.qn * c.nrm), 6) AS rcos
         | FROM q JOIN nm c ON c.vec_id <> q.qid)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rcos DESC, vec_id ASC) AS rank
         | FROM scored) t
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    "qs2_ann_lsh" ->
      s"""WITH $bucketSql,
         |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket AS qbucket
         |      FROM e WHERE vec_id % 100 = 0),
         |cand AS (
         | SELECT q.qid, q.qbucket, c.vec_id,
         |  round(${sqlDot("q.qe", "c.embedding")} / (q.qn * c.nrm), 6) AS rcos
         | FROM q JOIN e c ON q.qbucket = c.bucket AND c.vec_id <> q.qid),
         |best AS (
         | SELECT qid, vec_id AS best_id, rcos AS best_rcos FROM (
         |  SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rcos DESC, vec_id ASC) AS rn FROM cand) t WHERE rn = 1),
         |nc AS (SELECT qid, COUNT(*) AS n_candidates FROM cand GROUP BY 1)
         |SELECT q.qid, q.qbucket AS bucket, COALESCE(nc.n_candidates, 0) AS n_candidates,
         | best.best_id, best.best_rcos
         |FROM q LEFT JOIN nc ON q.qid = nc.qid LEFT JOIN best ON q.qid = best.qid
         |ORDER BY q.qid""".stripMargin,
    "qs4_ann_multiprobe" ->
      s"""WITH $bucketSql,
         |q0 AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, bucket AS qbucket
         |       FROM e WHERE vec_id % 100 = 0),
         |probelists AS (
         | SELECT qid, qe, qn, list_prepend(qbucket,
         |   list_transform(range(0, $Planes), p -> xor(qbucket, CAST(pow(2, p) AS BIGINT)))) AS pbs
         | FROM q0),
         |probes AS (SELECT qid, qe, qn, unnest(pbs) AS pb FROM probelists),
         |cand AS (
         | SELECT p.qid, c.vec_id,
         |  round(${sqlDot("p.qe", "c.embedding")} / (p.qn * c.nrm), 6) AS rcos
         | FROM probes p JOIN e c ON p.pb = c.bucket AND c.vec_id <> p.qid)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id AS neighbor_id, rcos FROM (
         | SELECT qid, vec_id, rcos, ROW_NUMBER() OVER (PARTITION BY qid
         |   ORDER BY rcos DESC, vec_id ASC) AS rn FROM cand) t
         |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin,
    // qs5 composes the qs1 (exact) and qs3 (IVF) CTE chains verbatim and
    // joins them on the sampled query set; recall rolls up per label
    "qs5_ann_recall" ->
      s"""WITH nm AS (
         | SELECT vec_id, embedding,
         |  sqrt((SELECT SUM(CAST(embedding[i.i + 1] AS DOUBLE) * CAST(embedding[i.i + 1] AS DOUBLE))
         |        FROM range($Dim) i(i))) AS nrm
         | FROM embeddings),
         |xq AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM nm WHERE vec_id % 100 = 0),
         |xscored AS (
         | SELECT xq.qid, c.vec_id,
         |  round(${sqlDot("xq.qe", "c.embedding")} / (xq.qn * c.nrm), 6) AS rcos
         | FROM xq JOIN nm c ON c.vec_id <> xq.qid),
         |exact AS (
         | SELECT qid, vec_id, rank FROM (
         |  SELECT qid, vec_id,
         |   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rcos DESC, vec_id ASC) AS rank
         |  FROM xscored) t WHERE rank <= 3),
         |cents AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM nm
         |          WHERE vec_id % 100 = 7),
         |cscored AS (
         | SELECT nm.vec_id, cents.cid,
         |  round(${sqlDot("cents.ce", "nm.embedding")} / (cents.cn * nm.nrm), 6) AS crcos
         | FROM nm, cents),
         |assigned AS (
         | SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY crcos DESC, cid ASC) AS rn FROM cscored) t WHERE rn = 1),
         |av AS (SELECT nm.vec_id, nm.embedding, nm.nrm, assigned.cell
         |       FROM nm JOIN assigned ON nm.vec_id = assigned.vec_id),
         |iq AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn, cell AS qcell
         |       FROM av WHERE vec_id % 100 = 0),
         |icand AS (
         | SELECT iq.qid, c.vec_id,
         |  round(${sqlDot("iq.qe", "c.embedding")} / (iq.qn * c.nrm), 6) AS rcos
         | FROM iq JOIN av c ON iq.qcell = c.cell AND c.vec_id <> iq.qid),
         |ibest AS (
         | SELECT qid, vec_id AS best_id FROM (
         |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rcos DESC, vec_id ASC) AS rn FROM icand) t WHERE rn = 1),
         |inc AS (SELECT qid, COUNT(*) AS n_candidates FROM icand GROUP BY 1),
         |hits AS (
         | SELECT iq.qid, COALESCE(inc.n_candidates, 0) AS n_candidates,
         |  CASE WHEN e.rank = 1 THEN 1 ELSE 0 END AS hit1,
         |  CASE WHEN e.rank IS NOT NULL THEN 1 ELSE 0 END AS hit3
         | FROM iq LEFT JOIN ibest ON iq.qid = ibest.qid
         | LEFT JOIN inc ON iq.qid = inc.qid
         | LEFT JOIN exact e ON iq.qid = e.qid AND ibest.best_id = e.vec_id)
         |SELECT emb.label, COUNT(*) AS n_queries,
         | CAST(SUM(hit1) AS BIGINT) AS n_hit_at_1,
         | CAST(SUM(hit3) AS BIGINT) AS n_hit_in_3,
         | CAST(SUM(n_candidates) AS BIGINT) AS n_candidates
         |FROM hits JOIN embeddings emb ON hits.qid = emb.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin)
}
