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
      .withColumn("top_bg_pct", expr(
        "array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x)))) * 100 div (n_tok - 1)"))
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
    val admitted = clean
      .join(broadcast(rates.select(col("source"), col("rate_ppm"))), Seq("source"))
      .filter(pmod(
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 6), 16, 10)
          .cast("long"), lit(1000000)) < col("rate_ppm"))

    // packing: qt6's distributed first-fit-decreasing
    T.packFirstFit(admitted.select(col("doc_id"), col("n_tok").as("tok")),
        p.packCapacity)
      .join(admitted.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("tok"), col("bin"))
  }
}
