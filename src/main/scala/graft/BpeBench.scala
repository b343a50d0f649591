package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE trainer cost at production VOCABULARY sizes — the corpus rungs
  * can't measure this (ScaleGen replicas repeat the same words, so the
  * vocab never grows; qt18's corpus exponent is 0.006), so this bench
  * synthesizes vocabularies directly: `n` distinct 8-hex-char words
  * (md5-derived — inside the trainer's `[a-z0-9]` charset), one doc
  * each, and times [[graft.batch.TextOps.bpeTrain]]'s 12 rounds. The
  * question it answers: how far does the vocab-side loop carry before
  * minFreq (the head-vocabulary cut) must do the bounding. One JSON
  * line per the Bench contract. */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_BPE_VOCABS", "10000,100000,500000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def d3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val rows = sizes.map { n =>
      // one row per distinct word; substring of md5 keeps words 8 chars
      // (hex → the clean charset) and collisions only shrink the vocab
      // marginally at these sizes
      val docs = spark.range(n.toLong)
        .select(substring(md5(col("id").cast("string")), 1, 8).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (merges, vocab) = graft.batch.TextOps.bpeTrain(docs, 12)
      val nVocab = vocab.count()
      val secs = (System.nanoTime() - t0) / 1e9
      s""""v$n":{"n_vocab":$nVocab,"merges":${merges.length},""" +
        s""""secs":${d3(secs)},"secs_per_round":${d3(secs / 12)}}"""
    }
    println(s"""{"metric":"bpe_train_vocab_secs","value":${sizes.max},""" +
      s""""unit":"words","rungs":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
