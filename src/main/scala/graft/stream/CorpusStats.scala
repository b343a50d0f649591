package graft.stream

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming corpus statistics — the observability membrane a curation
  * pipeline runs WHILE ingesting, answering "what is in the corpus so
  * far" without ever re-scanning admitted data:
  *
  *  - token heavy hitters via a per-epoch Misra-Gries sketch
  *    ([[graft.functions.MisraGries]]): each micro-batch folds its
  *    token stream into one bounded ≤[[Capacity]]-entry sketch row set;
  *  - distinct-content cardinality via a per-epoch HLL sketch blob
  *    (Spark 4 `hll_sketch_agg` over the content hash — q41's store
  *    pattern applied per epoch);
  *  - exact additive totals (docs, tokens).
  *
  * Merge-on-read: [[summary]] unions epochs `< upTo` and merges —
  * counts sum per token (the mergeable-summaries MG merge WITHOUT the
  * final shrink, so no merge-time error is added and the per-epoch
  * bound Σ N_e/(cap+1) = N/(cap+1) carries over: every token above
  * that threshold across the WHOLE stream is present), HLL blobs
  * `hll_union_agg`, totals sum. All merge inputs are bounded —
  * ≤ Capacity rows + one blob + one totals row per epoch — so the
  * summary never touches corpus-sized data.
  *
  * Exactly-once like every membrane store: each epoch OVERWRITES its
  * own partition (`stats_mg/epoch=N`, `stats_agg/epoch=N`), so a
  * replayed micro-batch replaces partial output instead of
  * double-counting (the [[IngestDedup.ingestBatch]] protocol).
  */
object CorpusStats {

  val Capacity = 256

  /** Fold one micro-batch's stats into the epoch store. Callable from
    * `foreachBatch` or on a plain backfill batch; `batch` must carry
    * (doc_id, text). Same epochId contract as IngestDedup: strictly
    * increasing, never defaulted. */
  def fold(batch: DataFrame, dir: String, epochId: Long): Unit = {
    val mg = graft.functions.MisraGries.udafFor(Capacity)
    val toks = batch
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // one pass over the batch: sketch + exact token count together
    val sk = toks.agg(mg(col("tok")).as("cands"), count(lit(1)).as("n_tokens"))
      .localCheckpoint()
    // MG lower-bound counts ride with the candidates so epoch sketches
    // merge by plain summation (select the counts via a re-reduce over
    // the batch is wrong — instead recount the bounded candidate set
    // exactly, qt15's second pass, so stored per-epoch counts are exact
    // for the epoch and the merged sum is a true lower bound)
    val cands = sk.select(explode(col("cands")).as("tok"))
    toks.join(broadcast(cands), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/stats_mg/epoch=$epochId")
    // n_tokens comes from the SAME filtered token stream the MG sketch
    // consumed (sk already counted it) — re-deriving via size(split())
    // would count empty strings on whitespace-irregular text and bias
    // any share computed as cnt/n_tokens
    batch.agg(
        count(lit(1)).as("n_docs"),
        expr("hll_sketch_agg(md5(text))").as("content_sk"))
      .crossJoin(sk.select(col("n_tokens")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/stats_agg/epoch=$epochId")
  }

  /** Merged view over epochs `< upTo`: (heavy-hitter candidates with
    * summed counts, one totals row with the HLL distinct-content
    * estimate). Bounded input per epoch; no corpus scan. */
  def summary(s: SparkSession, dir: String, upTo: Long): (DataFrame, DataFrame) = {
    val mg = s.read.parquet(s"$dir/stats_mg").filter(col("epoch") < upTo)
      .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
    val agg = s.read.parquet(s"$dir/stats_agg").filter(col("epoch") < upTo)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        expr("hll_sketch_estimate(hll_union_agg(content_sk))").as("est_distinct_content"))
    (mg, agg)
  }
}
