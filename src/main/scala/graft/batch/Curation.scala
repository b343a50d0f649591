package graft.batch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.batch.{TextOps => T}

/** The composed batch curation pipeline — the end-to-end pass a
  * training-data run actually executes, as ONE library entry:
  *
  *   quality filters (qt2 stopword score + qt9 repetition) →
  *   exact dedup (qd1's min-per-content) →
  *   near dedup (qd2 bands, bucket-min rule) →
  *   eval-set decontamination (qd10 span fingerprints) →
  *   mixture sampling (qt8's integer-exact hash admission) →
  *   sequence packing (qt6's first-fit-decreasing)
  *
  * Composition is where scan discipline gets lost — five stages naively
  * chained re-tokenize the corpus five times. Here the corpus TEXT is
  * scanned exactly ONCE (CurationSpec pins it with a per-row
  * accumulator): pass 1 computes every per-doc signal the chain needs —
  * quality flags (which filter map-side inside the same pass), content
  * hash, LSH bands, span fingerprints, token count — and checkpoints
  * the narrow signal frame WITHOUT the text. Every later stage works on
  * that materialization.
  *
  * Post-checkpoint data movement, per stage (PLANS.md "curation
  * pipeline" row):
  *   - exact dedup: one exchange of (content_key, doc_id) pairs;
  *   - near dedup: one exchange of band keys (bucket-min, linear in
  *     hot-bucket size — never pairwise), then an anti join on doc_id.
  *     The loser set scales with the corpus dup rate, so it is NOT
  *     broadcast (a 50%-dup crawl would broadcast billions of ids);
  *   - decontam: the EVAL side tokenizes once and its stride-1
  *     fingerprint set broadcasts (benchmark-sized by definition);
  *     corpus fingerprints probe it map-side, then the contaminated
  *     ids anti-join on doc_id — same non-broadcast reasoning;
  *   - mixture: one source-cardinality aggregate broadcast back onto a
  *     map-side hash-admission filter (qt8's shape);
  *   - packing: one range exchange of the admitted (doc_id, tok)
  *     pairs (qt6's shape).
  *
  * Total: one text scan and a handful of exchanges that carry only
  * narrow signal columns — never the text. At 100 TB the checkpoint
  * would be a written table; the stage plans are unchanged.
  */
object Curation {

  /** Tunables, defaulted to the fixture-scale demo values of the
    * operators they come from. `weightPerMille` is the uniform qt8
    * mixture weight; heterogeneous weights join a config table in at
    * the `rates` aggregate without changing any plan shape. */
  case class Params(
      minTok: Long = 5,
      maxTopBigramPct: Long = 60,
      mixtureBudget: Long = 20000L,
      weightPerMille: Long = 20,
      packCapacity: Long = 2048L)

  /** Run the pipeline: `docs` (doc_id, source, text) and `eval`
    * (doc_id, text) → packed admitted docs
    * (doc_id, source, tok, bin). */
  def curate(docs: DataFrame, eval: DataFrame,
             p: Params = Params()): DataFrame = {
    val adm = admitted(docs, eval, p)
    // packing: qt6's distributed first-fit-decreasing
    T.packFirstFit(adm.select(col("doc_id"), col("n_tok").as("tok")),
        p.packCapacity)
      .join(adm.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("tok"), col("bin"))
  }

  /** Every stage up to (not including) packing — the admitted doc set
    * `(doc_id, source, n_tok)`. Split out so the composed selection is
    * ORACLE-CHECKED end-to-end (qc1): bin assignment is partitioning-
    * dependent, but which docs survive the composed membrane is exact
    * relational semantics DuckDB can reproduce. */
  private[graft] def admitted(docs: DataFrame, eval: DataFrame,
      p: Params): DataFrame = {
    // PASS 1 — the only full-text scan. Quality gates run as map-side
    // filters fused into this same pass; everything downstream needs
    // is computed row-local and checkpointed narrow (no text column).
    val sig = docs
      .withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") >= p.minTok)
      .withColumn("n_dup", col("n_tok") - size(array_distinct(col("toks"))).cast("long"))
      .withColumn("bg", expr(
        "transform(sequence(0, cast(n_tok as int) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
      // sorted-run max multiplicity (qt9's form): one bg reference, so
      // the quality predicate stays O(n log n) per row even after
      // pushdown inlines it — the naive per-distinct filter() form
      // cost 17 s of the original 18 s qc1 steady time at sf0.1
      .withColumn("top_bg_pct", expr(
        "aggregate(array_sort(bg), named_struct('prev', '', 'run', 0L, 'best', 0L), " +
          "(acc, x) -> named_struct('prev', x, " +
          "'run', IF(x = acc.prev, acc.run + 1L, 1L), " +
          "'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1L, 1L))), " +
          "acc -> acc.best) * 100 div (n_tok - 1)"))
      .filter(col("n_dup") * 2 < col("n_tok") && // qt9's repetitive-doc gate
        col("top_bg_pct") <= p.maxTopBigramPct)
      .withColumn("content_key", md5(col("text").cast("binary")))
      .withColumn("bands", Dedup.bandKeys(col("text")))
      .withColumn("fps", expr(
        // qd10's corpus-side stride-16 window fingerprints; empty for
        // docs too short to hold one window
        "IF(length(text) >= 32, transform(sequence(0, cast((length(text) - 32) div 16 as int)), " +
          "i -> md5(cast(substring(text, 1 + 16 * i, 32) as binary))), array())"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("content_key"), col("bands"), col("fps"))
      .localCheckpoint()

    // exact dedup: min doc_id per content wins (qd1's rule)
    val exactWin = sig.groupBy(col("content_key")).agg(min(col("doc_id")).as("doc_id"))
    val ex = sig.join(exactWin, Seq("content_key", "doc_id"))

    // near dedup: a doc loses iff a smaller doc_id shares any band —
    // computed per bucket (doc_id > bucket min), linear in hot buckets
    val bk = ex.select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.key").as("key"))
      .filter(col("key").isNotNull)
    val bmin = bk.groupBy(col("band"), col("key")).agg(min(col("doc_id")).as("min_id"))
    val losers = bk.join(bmin, Seq("band", "key"))
      .filter(col("doc_id") > col("min_id")).select(col("doc_id")).distinct()
    val deduped = ex.join(losers, Seq("doc_id"), "left_anti")

    // decontamination: eval emits stride-1 fingerprints (exact for any
    // shared span ≥ 47 chars against the corpus's stride-16 windows)
    val evFps = eval.filter(length(col("text")) >= 32)
      .select(explode(expr(
        "transform(sequence(0, length(text) - 32), " +
          "i -> md5(cast(substring(text, 1 + i, 32) as binary)))")).as("fp"))
      .distinct()
    val contaminated = deduped.select(col("doc_id"), explode(col("fps")).as("fp"))
      .join(broadcast(evFps), Seq("fp")).select(col("doc_id")).distinct()
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds the inventory AND the admission filter

    // mixture: qt8's two-scan inventory-then-admit over the survivors
    val rates = clean.groupBy(col("source")).agg(sum(col("n_tok")).as("total_toks"))
      .withColumn("rate_ppm", least(lit(1000000L),
        expr(s"(${p.mixtureBudget} * ${p.weightPerMille} * 1000) div total_toks")))
    clean
      .join(broadcast(rates.select(col("source"), col("rate_ppm"))), Seq("source"))
      .filter(pmod(
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6), 16, 10)
          .cast("long"), lit(1000000)) < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("n_tok"))
  }

  /** qc1: the composed curation selection on the fixture corpus —
    * every 10th doc (doc_id % 10 = 7) plays the eval set (qd10's
    * split), the rest is the corpus; output is the admitted doc list
    * with its token count, which pins ALL five membrane stages —
    * quality gates, exact dedup, band near-dedup, span
    * decontamination, and the mixture hash admission — against one
    * DuckDB oracle in a single composed check. */
  def qc1_curation(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val all = graft.Tables.spread(graft.Tables.documents(s, d))
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    admitted(corpus, ev, Params()).orderBy("doc_id")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("qc1_curation" -> (qc1_curation _))

  val oracle: Map[String, String] = Map(
    "qc1_curation" ->
      """WITH corpus AS (
        | SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 7),
        |ev AS (SELECT text FROM documents WHERE doc_id % 10 = 7),
        |t AS (
        | SELECT doc_id, source, text,
        |  list_filter(string_split(lower(text), ' '), x -> length(x) > 0) AS toks
        | FROM corpus),
        |q AS (
        | SELECT doc_id, source, text, toks, CAST(len(toks) AS BIGINT) AS n_tok,
        |  CAST(len(toks) AS BIGINT) - CAST(len(list_distinct(toks)) AS BIGINT) AS n_dup
        | FROM t WHERE len(toks) >= 5),
        |qb AS (
        | SELECT doc_id, source, text, n_tok, n_dup,
        |  CAST(list_max(list_transform(list_distinct(bg),
        |   x -> len(list_filter(bg, y -> y = x)))) AS BIGINT) AS max_bg
        | FROM (SELECT *, list_transform(range(CAST(n_tok AS INT) - 1),
        |   i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]) AS bg FROM q)),
        |pass AS (
        | SELECT doc_id, source, text, n_tok FROM qb
        | WHERE n_dup * 2 < n_tok AND max_bg * 100 // (n_tok - 1) <= 60),
        |exwin AS (SELECT md5(text) AS ck, MIN(doc_id) AS win FROM pass GROUP BY 1),
        |ex AS (SELECT p.* FROM pass p JOIN exwin w ON p.doc_id = w.win),
        |sh AS (
        | SELECT DISTINCT doc_id, concat_ws(' ', tk[i+1], tk[i+2], tk[i+3]) AS shingle
        | FROM (
        |  SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 3, 0) + 1)) AS i
        |  FROM (SELECT doc_id, string_split(lower(substr(text, 1, 120)), ' ') AS tk
        |        FROM ex))
        | WHERE length(concat_ws(' ', tk[i+1], tk[i+2], tk[i+3])) > 0),
        |sigs AS (
        | SELECT doc_id,
        |  MIN(md5('0|' || shingle)) AS h0, MIN(md5('1|' || shingle)) AS h1,
        |  MIN(md5('2|' || shingle)) AS h2, MIN(md5('3|' || shingle)) AS h3,
        |  MIN(md5('4|' || shingle)) AS h4, MIN(md5('5|' || shingle)) AS h5
        | FROM sh GROUP BY 1),
        |bands AS (
        | SELECT doc_id, 0 AS band, md5(h0 || h1 || h2) AS key FROM sigs
        | UNION ALL
        | SELECT doc_id, 1 AS band, md5(h3 || h4 || h5) AS key FROM sigs),
        |bmin AS (SELECT band, key, MIN(doc_id) AS min_id FROM bands GROUP BY 1, 2),
        |losers AS (
        | SELECT DISTINCT b.doc_id FROM bands b JOIN bmin USING (band, key)
        | WHERE b.doc_id > bmin.min_id),
        |dd AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |cfp AS (
        | SELECT DISTINCT doc_id, md5(substr(text, CAST(1 + 16 * i AS INT), 32)) AS fp
        | FROM (SELECT doc_id, text, unnest(range(0, (length(text) - 32) // 16 + 1)) AS i
        |       FROM dd WHERE length(text) >= 32)),
        |efp AS (
        | SELECT DISTINCT md5(substr(text, CAST(1 + i AS INT), 32)) AS fp
        | FROM (SELECT text, unnest(range(0, length(text) - 31)) AS i
        |       FROM ev WHERE length(text) >= 32)),
        |cont AS (SELECT DISTINCT doc_id FROM cfp JOIN efp USING (fp)),
        |clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
        |rates AS (
        | SELECT source,
        |  least(1000000, (20000 * 20 * 1000) // CAST(SUM(n_tok) AS BIGINT)) AS rate_ppm
        | FROM clean GROUP BY 1)
        |SELECT c.doc_id, c.source, c.n_tok
        |FROM clean c JOIN rates r ON c.source = r.source
        |WHERE ('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000000
        |      < r.rate_ppm
        |ORDER BY c.doc_id""".stripMargin)
}
