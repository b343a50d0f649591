package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput of the dedup-at-ingest path (stream.IngestDedup): N
  * synthetic docs in B-sized batches, each batch exact- and
  * near-dup-filtered against the accumulating corpus index.
  *
  * Synthetic corpus with known duplicate structure, per group of 5 ids:
  * one base doc, one exact dup (same text), one near dup (same
  * 120-char shingle window, different tail), two uniques → the
  * converged corpus keeps 3/5 of docs (base kept, exact dup dropped,
  * near dup dropped, both uniques kept).
  *
  * Env: GRAFT_INGEST_DOCS (default 100000), GRAFT_INGEST_BATCHES (10).
  * Prints one JSON line with docs/sec and the dedup ratio achieved.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_INGEST_DOCS", "100000").toLong
    val nBatches = sys.env.getOrElse("GRAFT_INGEST_BATCHES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    // deterministic text: 30 group-seeded tokens (shared shingle window)
    // + per-variant tail
    def toks(seed: Column, n: Int, salt: String): Column =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        i => substring(md5(concat(seed, lit(s"|$salt|"), i.cast("string"))), 1, 4)))
    val g = col("id") / 5
    val grp = g.cast("long").cast("string")
    val variant = pmod(col("id"), lit(5))
    val docs = spark.range(nDocs).toDF("id")
      .withColumn("text",
        when(variant === 0, toks(grp, 30, "base"))
        .when(variant === 1, toks(grp, 30, "base"))                             // exact dup of 0
        .when(variant === 2, concat(toks(grp, 30, "base"), lit(" "), toks(grp, 4, "tail"))) // near dup
        .otherwise(toks(concat(grp, variant.cast("string")), 30, "uniq")))
      .withColumnRenamed("id", "doc_id")

    val batchSize = math.max(1L, nDocs / nBatches)
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      // last batch takes the division remainder so every doc ingests
      val hi = if (b == nBatches - 1) nDocs else (b + 1) * batchSize
      stream.IngestDedup.ingestBatch(
        docs.filter(col("doc_id") >= b * batchSize && col("doc_id") < hi),
        dir, epochId = b)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val kept = spark.read.parquet(s"$dir/corpus").count()
    println(f"""{"metric":"ingest_docs_per_sec","value":${nDocs / secs}%.1f,"docs":$nDocs,"batches":$nBatches,"kept":$kept,"expected_kept":${nDocs * 3 / 5},"secs":$secs%.1f}""")
    spark.stop()
  }
}
