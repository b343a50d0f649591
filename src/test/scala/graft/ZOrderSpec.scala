package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey interleaves bits little-endian across columns") {
    val df = Seq((1L, 0L), (0L, 1L), (1L, 1L), (3L, 3L), (255L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")), 8).as("z"))
    // bit 2i = bit i of x, bit 2i+1 = bit i of y
    assert(df.as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L, 15L, 0x5555L))
  }

  test("zkey of one column with full width is the identity") {
    val df = spark.range(1000)
      .select(ZOrder.zkey(Seq(col("id")), 32).as("z"))
    assert(df.as[Long].collect().toSeq == (0L until 1000L))
  }

  test("zkey is invertible: de-interleaving recovers both inputs (300 random pairs)") {
    // bijectivity is what makes the key safe as a clustering axis — two
    // distinct (x, y) cells can never collide into one z value
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zkey(Seq(col("x"), col("y")), 12).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val xBack = (0 until 12).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yBack = (0 until 12).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xBack == x && yBack == y, s"zkey not invertible at ($x,$y) -> $z")
    }
    assert(got.map(_.getLong(2)).distinct.length == pairs.distinct.length)
  }

  test("normalize maps [lo,hi] onto [0, 2^bits) with clamping") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 105.0).toDF("v")
      .select(ZOrder.normalize(col("v"), 0.0, 100.0, 4).as("b"))
    val b = df.as[Long].collect().toSeq
    assert(b.head == 0L && b(1) == 0L && b(2) == 8L)
    assert(b(3) == 15L && b(4) == 15L) // hi and beyond clamp to last bucket
  }

  test("z-ordered layout skips files on the NON-leading key; linear sort cannot") {
    // two independent uniform keys: x sequential, y decorrelated via a
    // multiplicative hash — a linear sort by x leaves y full-range in
    // every file, the exact layout problem z-ordering exists to fix
    val n = 1 << 16
    val data = spark.range(n)
      .select((col("id") % 256).as("x"),
        (pmod(col("id") * 48271L, lit(65537L)) % 256).as("y"),
        col("id").as("payload"))
    val base = Files.createTempDirectory("zorder").toString
    data.orderBy("x").repartitionByRange(16, col("x"))
      .write.parquet(s"$base/linear")
    data.write.parquet(s"$base/raw")
    ZOrder.clusterTo(spark, s"$base/raw", s"$base/z", Seq("x", "y"), nFiles = 16, bits = 8)

    // same point-range predicate on y against both layouts
    val linear = ZOrder.filesOverlapping(spark, s"$base/linear", "y", 10, 25)
    val z = ZOrder.filesOverlapping(spark, s"$base/z", "y", 10, 25)
    assert(linear == 16, s"linear layout should have no skip on y (got $linear)")
    assert(z <= 8, s"z-order should skip at least half the files on y (got $z)")

    // and the z layout still skips on x too (the leading linear key)
    val zx = ZOrder.filesOverlapping(spark, s"$base/z", "x", 10, 25)
    assert(zx <= 8, s"z-order should also skip on x (got $zx)")

    // clustering preserved the data
    val back = spark.read.parquet(s"$base/z")
    assert(back.count() == n)
    assert(back.agg(sum("payload")).head().getLong(0) == (n.toLong * (n - 1) / 2))
  }
}
