package graft

import java.security.MessageDigest

import graft.batch.TextOps

/** qt17's DSIR-shaped importance selection: the whole hashed-ngram →
  * bucket-distribution → integer-weight → top-k pipeline against an
  * independent driver-side BigInt re-computation on the sf0.001
  * fixture, plus the selection-pressure property the operator exists
  * for (target-domain docs must outrank the raw corpus).
  */
class ImportanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = TextOps.ImportanceBuckets

  private def md5Bucket(tok: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.take(5)
    java.lang.Long.parseLong(hex, 16) % B
  }

  /** Independent restatement of the scoring pipeline: plain Scala
    * collections + BigInt, no Spark, no SQL — a third engine. */
  private def reference(): Map[Long, (String, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dbc = collection.mutable.Map.empty[(Long, Long), Long] // (doc,bucket)→c
    val lang = collection.mutable.Map.empty[Long, String]
    for ((id, l, text) <- docs) {
      lang(id) = l
      for (t <- text.toLowerCase.split(" ", -1) if t.nonEmpty) {
        val k = (id, md5Bucket(t))
        dbc(k) = dbc.getOrElse(k, 0L) + 1L
      }
    }
    val qc = collection.mutable.Map.empty[Long, Long]
    val pc = collection.mutable.Map.empty[Long, Long]
    for (((id, b), c) <- dbc) {
      qc(b) = qc.getOrElse(b, 0L) + c
      if (lang(id) == "en") pc(b) = pc.getOrElse(b, 0L) + c
    }
    val qtot = qc.values.sum
    val ptot = pc.values.sum
    def w(b: Long): Long =
      ((BigInt(pc.getOrElse(b, 0L)) + 1) * 1000000 / (BigInt(ptot) + B)).toLong -
        ((BigInt(qc.getOrElse(b, 0L)) + 1) * 1000000 / (BigInt(qtot) + B)).toLong
    dbc.groupBy(_._1._1).map { case (id, m) =>
      id -> (lang(id), m.map { case ((_, b), c) => c * w(b) }.sum)
    }
  }

  test("top-k matches an independent BigInt re-computation exactly") {
    val got = TextOps.qt17_importance_select(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ref = reference()
    val expect = ref.toSeq
      .map { case (id, (l, s)) => (id, l, s) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(100)
    assert(got.toSeq === expect)
  }

  test("selection pressure: target-domain docs outrank the raw corpus") {
    val ref = reference()
    val (en, rest) = ref.values.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val meanEn = en.map(_._2).sum.toDouble / en.size
    val meanRest = rest.map(_._2).sum.toDouble / rest.size
    assert(meanEn > meanRest,
      s"mean importance en=$meanEn must exceed non-target=$meanRest")
    // and the selected set is en-enriched vs the corpus base rate
    val got = TextOps.qt17_importance_select(spark, dir).collect()
    val enShareSelected = got.count(_.getString(1) == "en").toDouble / got.length
    val enShareCorpus = en.size.toDouble / ref.size
    assert(enShareSelected > enShareCorpus,
      s"selected en share $enShareSelected must beat base rate $enShareCorpus")
  }
}
