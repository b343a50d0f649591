package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.PlcFunctions._

/** Unit + property tests for the PLC decode/expand/shift functions
  * (semantics from Prensas.py:442-471, 653-659; see SURVEY §5.2-5.3). */
class PlcFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic property sampling (no scalatest-scalacheck bridge in
    * the offline cache): draw n samples with fixed seeds. */
  private def forAll[T](gen: Gen[T], n: Int = 40)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("decodePlcWords: little-endian, two chars per word") {
    // "AB" → 0x4241 = 16961 (low byte first, Prensas.py:459-461)
    val got = Seq(Seq(16961)).toDF("w").select(decodePlcWords($"w")).as[String].collect()
    assert(got.head == "AB")
  }

  test("decodePlcWords strips NULs but keeps spaces") {
    // "A" + NUL high byte → "A"; space (32) survives
    val got = Seq(Seq(65, 0x2020)).toDF("w").select(decodePlcWords($"w")).as[String].collect()
    assert(got.head == "A  ")
  }

  test("encode ∘ decode round-trips printable ASCII (property)") {
    val printable = Gen.listOf(Gen.choose(33.toChar, 126.toChar)).map(_.mkString)
    forAll(printable) { s0 =>
      val s = s0.take(40)
      val got = Seq(s).toDF("s")
        .select(decodePlcWords(encodePlcWords($"s"))).as[String].collect().head
      assert(got == s)
    }
  }

  test("expandAlternatives: cartesian product in reference order") {
    // "ABC/DEF GH/IJ" → ABCGH, ABCIJ, DEFGH, DEFIJ (Prensas.py:442-448)
    val got = Seq("ABC/DEF GH/IJ").toDF("s")
      .select(expandAlternatives($"s")).as[Seq[String]].collect().head
    assert(got == Seq("ABCGH", "ABCIJ", "DEFGH", "DEFIJ"))
  }

  test("expandAlternatives: no slash → spaces removed, single candidate") {
    val got = Seq("AB CD EF").toDF("s")
      .select(expandAlternatives($"s")).as[Seq[String]].collect().head
    assert(got == Seq("ABCDEF"))
  }

  test("expandAlternatives: output size = product of alternative counts (property)") {
    val token = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.stringOfN(2, Gen.alphaUpperChar)).map(_.mkString("/")))
    val phrase = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, token))
    forAll(phrase) { toks =>
      val expected = toks.map(_.count(_ == '/') + 1).product
      val got = Seq(toks.mkString(" ")).toDF("s")
        .select(expandAlternatives($"s")).as[Seq[String]].collect().head
      assert(got.size == expected)
    }
  }

  test("expandBlock: prefix/digit split, consecutive addresses") {
    // ("D3100", 3) → D3100, D3101, D3102 (Prensas.py:467-471)
    val got = Seq(("D3100", 3)).toDF("a", "n")
      .select(expandBlock($"a", $"n")).as[Seq[String]].collect().head
    assert(got == Seq("D3100", "D3101", "D3102"))
  }

  test("expandBlock: non-digit chars form the prefix wherever they are") {
    val got = Seq(("W1F0", 2)).toDF("a", "n")
      .select(expandBlock($"a", $"n")).as[Seq[String]].collect().head
    // reference splits chars by isdigit: prefix "WF", base 10
    assert(got == Seq("WF10", "WF11"))
  }

  test("shift classification boundaries (Prensas.py:653-659)") {
    val rows = Seq(
      "2024-03-05 07:59:59" -> ((2, "2024-03-04")), // before 8am → shift 2, yesterday
      "2024-03-05 08:00:00" -> ((1, "2024-03-05")),
      "2024-03-05 15:59:59" -> ((1, "2024-03-05")),
      "2024-03-05 16:00:00" -> ((2, "2024-03-05")),
      "2024-03-05 23:30:00" -> ((2, "2024-03-05")),
      "2024-03-06 00:30:00" -> ((2, "2024-03-05")))
    for ((tsStr, (expShift, expDate)) <- rows) {
      val df = Seq(tsStr).toDF("raw").select(to_timestamp($"raw").as("ts"))
      val r = df.select(shiftOf($"ts").as("s"), planDateOf($"ts").cast("string").as("d"))
        .collect().head
      assert((r.getInt(0), r.getString(1)) == ((expShift, expDate)), s"at $tsStr")
    }
  }

  test("msToSeconds: abs(v/1000) with 0.0 fallback") {
    val got = Seq(("1500"), ("-2500"), ("oops")).toDF("v")
      .select(msToSeconds($"v")).as[Double].collect()
    assert(got.toSeq == Seq(1.5, 2.5, 0.0))
  }

  test("shiftChanged crosses 08:00 and 16:00 only") {
    val df = Seq((7 * 3600, 8 * 3600), (15 * 3600, 16 * 3600),
      (8 * 3600, 9 * 3600), (20 * 3600, 21 * 3600))
      .toDF("p", "c")
    val got = df.select(shiftChanged($"p", $"c")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false, false))
  }
}
