package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.batch.Multimodal
import graft.functions.GraftFunctions

/** Native PhashExpr vs the SQL-HOF chain it replaced
  * ([[Multimodal.withPhashNSql]]): value-identical per row on the
  * fixture corpus at both production block counts, on randomized
  * payloads (incl. the null/too-short guard), and reachable from SQL
  * under whole-stage codegen. */
class PhashExprSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def compare(df: org.apache.spark.sql.DataFrame, nBits: Int): Unit = {
    val native = Multimodal.withPhashN(df, nBits)
      .select(col("doc_id"), col("phash"))
    val sql = Multimodal.withPhashNSql(df, nBits)
      .select(col("doc_id"), col("phash").as("phash_sql"))
    val diff = native.join(sql, Seq("doc_id"))
      .filter(!(col("phash") <=> col("phash_sql")))
    assert(diff.count() === 0L,
      s"nBits=$nBits: ${diff.take(3).mkString(", ")}")
  }

  test("fixture corpus: native == SQL chain at 32 and 64 blocks") {
    val docs = Tables.spread(Tables.documents(spark, sf))
      .select(col("doc_id"), col("text"))
    compare(docs, 32)
    compare(docs, 64)
  }

  test("random payloads incl. null and sub-block lengths") {
    val gen = Gen.oneOf(
      Gen.const(Option.empty[String]),
      // spans the null guard boundary at both block counts
      Gen.choose(0, 200).flatMap(n =>
        Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(cs => Option(cs.mkString))),
      // repetitive payloads (flat intensity — every bit teeters on the
      // mean, the worst case for an off-by-one in block boundaries)
      Gen.choose(1, 40).map(n => Option("ab" * n)))
    val rows = (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).map(s => (i.toLong, s.orNull)))
    val df = rows.toDF("doc_id", "text")
    compare(df, 32)
    compare(df, 64)
    // non-ASCII path: multi-byte code points take the toString branch
    val uni = Seq((0L, "héllo wörld — " * 20), (1L, "日本語テキスト" * 30))
      .toDF("doc_id", "text")
    compare(uni, 32)
  }

  test("SQL registration + codegen plan") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT phash_blocks('abcdefghij' || repeat('xy', 40), 32) AS ph").head
    val expected = Seq((1L, "abcdefghij" + ("xy" * 40))).toDF("doc_id", "text")
    val viaChain = Multimodal.withPhashNSql(expected, 32).head.getAs[Long]("phash")
    assert(r.getLong(0) === viaChain)
    // the expression must live INSIDE WholeStageCodegen, not fall back
    // (a literal local frame would constant-fold to a LocalTableScan,
    // so the plan probe reads the parquet fixture)
    val plan = Multimodal.withPhashN(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")), 32)
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is this rendering's WholeStageCodegen marker;
    // the phash projection must carry it (no interpreted fallback)
    assert(plan.linesIterator.exists(l =>
      l.contains("phash_blocks") && l.trim.startsWith("*(")), plan)
  }
}
