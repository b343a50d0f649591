package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.batch.Dedup
import graft.functions.GraftFunctions

/** Native BandKeysExpr / SpanFingerprintsExpr vs the SQL-HOF chains
  * they replaced: value-identical per row on the fixture corpus and on
  * randomized payloads (empties, runs of spaces, sub-window lengths,
  * non-ASCII), and reachable from SQL. These two chains are qc1/qc2/
  * qc4's pass-1 signals and the decontam family's fingerprints — a
  * silent divergence would flip oracle hashes across seven queries, so
  * the equivalence is property-tested, not assumed. */
class BandKeysExprSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def genText: Gen[String] = Gen.oneOf(
    Gen.choose(0, 160).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
        1 -> Gen.alphaUpperChar, 1 -> Gen.numChar)).map(_.mkString)),
    Gen.const(""), Gen.const(" "), Gen.const("   "),
    Gen.const("a b"), Gen.const("one two three four five"),
    Gen.const("héllo wörld déjà vu " * 8),
    Gen.choose(1, 50).map(n => "ab  cd " * n))

  private def rows(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).flatMap(i =>
      genText.apply(Gen.Parameters.default, Seed(i.toLong)).map(s => (i.toLong, s)))
      .toDF("doc_id", "text")

  test("band_keys: native == SQL chain on fixture + random payloads") {
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val diff = df
        .select(col("doc_id"),
          Dedup.bandKeys(col("text")).as("native"),
          Dedup.bandKeysSql(col("text")).as("sql"))
        .filter(!(col("native").cast("string") <=> col("sql").cast("string")))
      assert(diff.count() === 0L, diff.take(3).mkString(", "))
    }
    check(Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    check(rows(400))
  }

  test("span_fps: native == SQL chain at stride 16 and 1") {
    def sqlFps(stride: Int) = expr(
      s"IF(length(text) >= 32, transform(sequence(0, cast((length(text) - 32) div $stride as int)), " +
        s"i -> md5(cast(substring(text, 1 + $stride * i, 32) as binary))), array())")
    def check(df: org.apache.spark.sql.DataFrame, stride: Int): Unit = {
      val diff = df
        .select(col("doc_id"),
          GraftFunctions.span_fps(col("text"), 32, stride).as("native"),
          sqlFps(stride).as("sql"))
        .filter(!(col("native").cast("string") <=> col("sql").cast("string")))
      assert(diff.count() === 0L, s"stride=$stride: ${diff.take(3).mkString(", ")}")
    }
    val fixture = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    check(fixture, 16)
    check(fixture, 1)
    check(rows(400), 16)
    check(rows(400), 1)
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT band_keys('one two three four') AS bk, " +
        "span_fps('abcdefghijklmnopqrstuvwxyz0123456789abcdefghij', 32, 16) AS fps").head
    assert(r.getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0)) === Seq(0, 1))
    assert(r.getSeq[String](1).nonEmpty)
  }
}
