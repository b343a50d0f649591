package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.batch.TextOps

/** qt16's context-window chunking: lossless coverage and edge cases. */
class ChunkSpec extends SparkSpec {

  private def chunksOf(texts: Seq[String]): Seq[Seq[String]] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Row(_)), 2),
      StructType(Seq(StructField("text", StringType))))
    df.select(col("text"), expr(TextOps.ChunkArrayExpr).as("chunks"))
      .collect().map(_.getSeq[String](1).toSeq).toSeq
  }

  test("stride-prefix concatenation reconstructs every document exactly") {
    // lengths straddling all the boundaries: empty-ish, < window,
    // == window, window+1, multiple strides, exact stride multiples
    val texts = Seq(5, 19, 20, 80, 99, 100, 101, 179, 180, 181, 500, 1000)
      .map(n => (1 to n).map(i => ('a' + i % 26).toChar).mkString)
    texts.zip(chunksOf(texts)).foreach { case (text, chunks) =>
      assert(chunks.nonEmpty)
      // every chunk except the last is a full window step; coverage =
      // first 80 chars of each chunk + whatever the last chunk holds
      val rebuilt = chunks.init.map(_.take(80)).mkString + chunks.last
      assert(rebuilt === text,
        s"len=${text.length}: ${chunks.map(_.length)} must cover losslessly")
      // overlap: each successive chunk repeats the previous one's tail
      chunks.sliding(2).foreach {
        case Seq(a, b) if a.length == 100 => assert(a.drop(80) === b.take(20))
        case _ => ()
      }
      assert(chunks.init.forall(_.length == 100), "only the last chunk may be short")
    }
  }

  test("short documents emit exactly one chunk equal to the document") {
    val texts = Seq("x", "short doc", "a" * 100)
    chunksOf(texts).zip(texts).foreach { case (chunks, t) =>
      assert(chunks === Seq(t))
    }
  }
}
