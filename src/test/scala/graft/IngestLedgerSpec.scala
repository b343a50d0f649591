package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.stream.IngestDedup

/** The ingest rejection ledger: (doc_id, dup_of, reason) recorded at
  * rejection time, folded into qd6-shaped duplicate clusters without a
  * batch LSH rebuild.
  */
class IngestLedgerSpec extends SparkSpec {
  import spark.implicits._

  // 120-char shingle window (see IngestDedupSpec): texts sharing a
  // 30-token prefix have the identical minhash signature, so every
  // member of a prefix family pairwise shares both bands — the star
  // shape under which stream clusters ≡ a full-corpus batch pass
  private def fam(tag: String) = (0 until 30).map(i => f"$tag%s$i%02d").mkString(" ")
  private val a = fam("a")
  private val b = fam("b")

  private def ledgerRows(dir: String) =
    IngestDedup.ledger(spark, s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        r.getAs[String]("reason"))).toSet

  test("stream-accumulated clusters ≡ union-find over the same corpus") {
    val dir = Files.createTempDirectory("graft_ledger").toString
    // family a: canonical 1, exact copy 3, near dups 6 and 12 (same
    // shingle window, fresh tails); family b: canonical 5, exact copy
    // 10; singletons 7, 20 — interleaved across three epochs
    val docs = Seq(
      1L -> (a + " t1"), 3L -> (a + " t1"), 5L -> (b + " s1"), // epoch 0
      6L -> (a + " t2"), 7L -> fam("c") ,  10L -> (b + " s1"), // epoch 1
      12L -> (a + " t3"), 20L -> fam("d")                      // epoch 2
    )
    docs.grouped(3).zipWithIndex.foreach { case (batch, epoch) =>
      IngestDedup.ingestBatch(batch.toDF("doc_id", "text"),
        s"$dir/out", epochId = epoch.toLong)
    }

    // Scala union-find reference over the raw docs: edges = identical
    // content OR a shared LSH band (what batch qd6 consumes)
    val keyed = docs.toDF("doc_id", "text")
      .withColumn("ck", md5(col("text").cast("binary")))
      .withColumn("bands", graft.batch.Dedup.bandKeys(col("text")))
      .select(col("doc_id"), col("ck"), expr("transform(bands, x -> x.key)").as("bks"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("ck"),
        r.getSeq[String](2).toSet))
    val parent = scala.collection.mutable.Map(keyed.map(k => k._1 -> k._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for {
      (ida, cka, bsa) <- keyed; (idb, ckb, bsb) <- keyed if ida < idb
      if cka == ckb || bsa.intersect(bsb).nonEmpty
    } { val (ra, rb) = (find(ida), find(idb)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val expected = keyed.map(_._1).groupBy(find).toSeq.flatMap { case (root, ms) =>
      ms.map(m => (m, root, m == root, ms.length.toLong))
    }.toSet

    val got = IngestDedup.clusters(spark, s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_canonical"), r.getAs[Long]("cluster_size"))).toSet
    assert(got == expected, s"stream clusters diverged:\n got=$got\n exp=$expected")

    // the ledger attributes every rejection to an admitted doc with the
    // stage that turned it away
    assert(ledgerRows(dir) == Set(
      (3L, Some(1L), "exact_batch"),
      (6L, Some(1L), "near_corpus"),
      (10L, Some(5L), "exact_corpus"),
      (12L, Some(1L), "near_corpus")))

    // folding the ledger on the compact cadence changes nothing
    IngestDedup.compactIndexes(spark, s"$dir/out", upTo = 3)
    assert(IngestDedup.clusters(spark, s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_canonical"), r.getAs[Long]("cluster_size"))).toSet == expected)
  }

  test("replayed epoch rewrites the identical ledger rows (exactly-once)") {
    val dir = Files.createTempDirectory("graft_ledger_r").toString
    IngestDedup.ingestBatch(Seq(1L -> (a + " t1"), 2L -> fam("e"))
      .toDF("doc_id", "text"), s"$dir/out", epochId = 0)
    val batch1 = Seq(4L -> (a + " t1"), 5L -> (a + " t9"), 6L -> fam("f"))
      .toDF("doc_id", "text")
    IngestDedup.ingestBatch(batch1, s"$dir/out", epochId = 1)
    val before = ledgerRows(dir)
    assert(before == Set(
      (4L, Some(1L), "exact_corpus"), (5L, Some(1L), "near_corpus")))
    // crash-replay of epoch 1: same rows, no duplicates
    IngestDedup.ingestBatch(batch1, s"$dir/out", epochId = 1)
    assert(ledgerRows(dir) == before, "replay must overwrite, not append")
  }

  test("in-batch chains resolve to the terminal admitted doc") {
    val dir = Files.createTempDirectory("graft_ledger_c").toString
    IngestDedup.ingestBatch(Seq(2L -> (a + " t1")).toDF("doc_id", "text"),
      s"$dir/out", epochId = 0)
    // 5 loses exact_corpus to 2; 9 loses exact_batch to 5 — the ledger
    // must chase 9 → 5 → 2 so every dup_of names an ADMITTED doc
    IngestDedup.ingestBatch(Seq(5L -> (a + " t1"), 9L -> (a + " t1"))
      .toDF("doc_id", "text"), s"$dir/out", epochId = 1)
    assert(ledgerRows(dir) == Set(
      (5L, Some(2L), "exact_corpus"), (9L, Some(2L), "exact_batch")))
    val admitted = spark.read.parquet(s"$dir/out/corpus")
      .select("doc_id").as[Long].collect().toSet
    assert(ledgerRows(dir).forall(r => admitted.contains(r._2.get)),
      "every dup_of must be an admitted doc")
  }
}
