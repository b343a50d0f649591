package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end wall cost of the composed corpus-version bump
  * ([[graft.batch.Curation.versionBump]], round-15 verdict #3) at
  * sf0.1: version 1 = the split-ledgered curateToShards over the
  * prior corpus (the baseline a recurring pipeline pays anyway), then
  * ONE bump — a new dump of genuinely-new docs plus re-crawled copies
  * — through admission → ledger → re-shard. The component costs are
  * rung-measured separately (qd22 0.089, ledger diff/compact
  * 0.322/0.199, qc7 layout 0.291); this row pins the composition's
  * actual wall clock and the report's rejection counts at fixture
  * scale. One JSON line per the Bench contract. */
object VersionBumpBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def d3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val root = java.nio.file.Files.createTempDirectory("vbump").toString
    val p = graft.batch.Curation.Params(splitLedgerDir = Some(s"$root/ledger"))
    val all = Tables.spread(Tables.documents(spark, sfDir)).localCheckpoint()
    val ev = all.filter(pmod(col("doc_id"), lit(10)) === 7)
      .select(col("doc_id"), col("text"))
    val corpus = all.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val prior = corpus.filter(pmod(col("doc_id"), lit(3)) =!= 1)
    val fresh = corpus.filter(pmod(col("doc_id"), lit(3)) === 1)
    val recrawl = prior.filter(pmod(col("doc_id"), lit(5)) === 0)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    val t0 = System.nanoTime()
    graft.batch.Curation.curateToShards(prior, ev, s"$root/v1", 4, p)
    val v1Secs = (System.nanoTime() - t0) / 1e9
    val newSlice = fresh.unionByName(recrawl).localCheckpoint()
    val t1 = System.nanoTime()
    val rep = graft.batch.Curation
      .versionBump(prior, newSlice, ev, s"$root/v2", 4, p).head()
    val bumpSecs = (System.nanoTime() - t1) / 1e9
    // the sigStore arm: identical bump, but the prior side reads its
    // persisted signature table instead of re-minhashing — the
    // recurring pipeline's steady state
    val p2 = graft.batch.Curation.Params(splitLedgerDir = Some(s"$root/ledger2"))
    graft.batch.Curation.curateToShards(prior, ev, s"$root/v1b", 4, p2)
    graft.batch.Dedup.saveSigs(spark, s"$root/sigs", 1L,
      graft.batch.Dedup.minhashSigsOf(prior))
    val t2 = System.nanoTime()
    val rep2 = graft.batch.Curation.versionBump(prior, newSlice, ev,
      s"$root/v2b", 4, p2, Some(s"$root/sigs")).head()
    val storedSecs = (System.nanoTime() - t2) / 1e9
    require(rep2.getLong(2) == rep.getLong(2),
      "stored-signature bump must reject the identical set")
    println(s"""{"metric":"version_bump_secs","value":${d3(bumpSecs)},""" +
      s""""unit":"sec","sf":"$sfDir","v1_secs":${d3(v1Secs)},""" +
      s""""bump_stored_sigs_secs":${d3(storedSecs)},""" +
      s""""ledger_version":${rep.getLong(0)},"n_new":${rep.getLong(1)},""" +
      s""""n_rejected":${rep.getLong(2)},"n_admitted":${rep.getLong(3)},""" +
      s""""n_recrawl":${recrawl.count()}}""")
    spark.stop()
  }
}
