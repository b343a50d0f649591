package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.stream.PatternMatch

class PatternMatchSpec extends SparkSpec {
  import spark.implicits._

  private val pattern = Seq(10L, 20L, 30L)

  /** Brute-force reference over a complete series. */
  private def expected(series: Seq[(Long, Long, Long)], maxDist: Long): Set[(Long, Long, Long)] =
    series.groupBy(_._1).flatMap { case (k, rows) =>
      rows.sortBy(_._2).sliding(3).filter(_.length == 3).flatMap { w =>
        val d = w.map(_._3).zip(pattern).map { case (a, b) => (a - b) * (a - b) }.sum
        if (d <= maxDist) Some((k, w.last._2, d)) else None
      }
    }.toSet

  test("streaming matches equal the batch sliding-window result, across batch boundaries") {
    val b1 = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 9L), (2L, 2L, 21L))
    val b2 = Seq((1L, 3L, 30L), (1L, 4L, 10L), (2L, 3L, 30L), (1L, 5L, 22L))
    val b3 = Seq((1L, 6L, 31L), (2L, 4L, 11L))
    val maxDist = 10L

    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val q = PatternMatch.matches(in.toDS(), pattern, maxDist)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pm_out").start()
    try {
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("pm_out").as[PatternMatch.Match]
        .collect().map(m => (m.key, m.us, m.dist)).toSet
      val want = expected(b1 ++ b2 ++ b3, maxDist)
      assert(got == want, s"got $got want $want")
      // the key evidence: at least one matching window straddles a
      // micro-batch boundary (key 1 window (2,3,4)=us 4 built from b2
      // state over b1 values)
      assert(want.exists(_._2 >= 3), "fixture must contain cross-batch windows")
    } finally q.stop()
  }

  test("state stays bounded at pattern length minus one") {
    // 100 events for one key: emitted matches grow, state does not
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val q = PatternMatch.matches(in.toDS(), pattern, Long.MaxValue)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pm_bound").start()
    try {
      in.addData((1L to 100L).map(i => (7L, i, i % 40)))
      q.processAllAvailable()
      assert(spark.table("pm_bound").count() == 98) // n - (p-1) windows
      val progress = q.lastProgress.stateOperators.head
      assert(progress.numRowsTotal == 1, "one state row per key, regardless of history")
    } finally q.stop()
  }
}
