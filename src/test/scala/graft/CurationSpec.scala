package graft

import org.apache.spark.sql.functions._

import graft.batch.{Curation, Dedup}

/** The composed curation pipeline: output invariants of every stage,
  * plus the scan audit — the corpus text is read exactly once.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("curate: one text pass; every stage's invariant holds on the output") {
    val passes = spark.sparkContext.longAccumulator("curation_text_passes")
    val raw = Tables.documents(spark, d)
    val nRaw = raw.count()
    // instrument the input: each full evaluation of the corpus adds
    // nRaw; the non-deterministic marker stops Catalyst from dropping
    // or reordering the counter out of the scan pass
    val tick = udf(() => { passes.add(1); true }).asNondeterministic()
    val docs = raw.filter(tick())
    val ev = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))

    val p = Curation.Params()
    val out = Curation.curate(docs, ev, p).cache()
    val outRows = out.collect()
    assert(outRows.nonEmpty, "curation must admit documents on the fixture")
    assert(passes.value == nRaw,
      s"corpus text scanned ${passes.value.toDouble / nRaw}x — must be exactly once")

    val ids = outRows.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.distinct.size == ids.size, "each doc packed exactly once")

    // join the admitted ids back to the raw text to verify the gates
    // independently of the pipeline's own signal computation
    val admitted = raw.join(out.select("doc_id"), Seq("doc_id")).cache()

    // quality gates
    val q = admitted
      .withColumn("toks", filter(split(lower(col("text")), " "), t => length(t) > 0))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_dup", col("n_tok") - size(array_distinct(col("toks"))).cast("long"))
    assert(q.filter(col("n_tok") < p.minTok || col("n_dup") * 2 >= col("n_tok")).isEmpty,
      "a quality-rejected doc leaked through")

    // exact dedup: no two admitted docs share content
    val ck = admitted.select(md5(col("text").cast("binary")).as("ck"))
    assert(ck.count() == ck.distinct().count(), "admitted exact dup")

    // near dedup: no two admitted docs share an LSH band
    val bandDup = admitted.withColumn("b", explode(Dedup.bandKeys(col("text"))))
      .filter(col("b.key").isNotNull)
      .groupBy(col("b.band"), col("b.key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(bandDup.isEmpty, "two admitted docs share a band")

    // decontamination: no admitted doc shares an aligned 32-char window
    // with the eval set (the stride-guaranteed detection class)
    val corpusFp = admitted.filter(length(col("text")) >= 32)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast((length(text) - 32) div 16 as int)), " +
          "i -> md5(cast(substring(text, 1 + 16 * i, 32) as binary)))")).as("fp"))
    val evFp = ev.filter(length(col("text")) >= 32)
      .select(explode(expr(
        "transform(sequence(0, length(text) - 32), " +
          "i -> md5(cast(substring(text, 1 + i, 32) as binary)))")).as("fp"))
      .distinct()
    assert(corpusFp.join(evFp, Seq("fp")).isEmpty, "contaminated doc admitted")

    // packing: no bin over capacity (oversized docs are singletons)
    val overfull = out.groupBy("bin")
      .agg(sum(least(col("tok"), lit(p.packCapacity))).as("used"))
      .filter(col("used") > p.packCapacity)
    assert(overfull.isEmpty, "a packed bin exceeds capacity")

    out.unpersist(); admitted.unpersist()
  }

  test("curate admission is deterministic across runs") {
    val docs = Tables.documents(spark, d)
    val ev = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    def admittedIds = Curation.curate(docs, ev).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(admittedIds == admittedIds, "two runs must admit identical doc sets")
  }
}
