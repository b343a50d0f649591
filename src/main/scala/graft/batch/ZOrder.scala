package graft.batch

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: multi-column data layout for min/max
  * data skipping — the Delta `OPTIMIZE ZORDER BY` / Iceberg
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')`
  * analog, expressed on plain parquet.
  *
  * Why it matters at 100 TB: [[Lake]] partitioning + [[Bucketing]]
  * cluster by ONE key hierarchy. A table queried by two independent
  * predicates (the reference's histories table is filtered by part
  * number in some dashboards and by date/station in others,
  * Prensas.py:285-302 vs 387-390) can only be linearly sorted by one of
  * them — files then carry full-range min/max stats for the other
  * column and nothing skips. Interleaving the bits of both keys gives
  * every file a tight hyper-rectangle in key space, so row-group /
  * file-level min-max pruning engages for EITHER predicate (~sqrt of
  * the files overlap a point query on one of two z-ordered columns,
  * vs. all of them when that column is unsorted).
  *
  * The key is a pure `Column` expression (shift/mask/or folds —
  * whole-stage-codegen-friendly, no UDF), so clustering is a plain
  * repartition-by-range + in-partition sort: one shuffle, identical
  * cost shape to [[Lake.compactTo]], and the two passes compose.
  */
object ZOrder {

  /** Interleave the low `bits` bits of the given non-negative integer
    * columns into one z-key: result bit `i*n + j` = bit `i` of column
    * `j` (column 0 contributes the least-significant bit of each
    * round). Total bits `bits * n` must fit a long (≤ 63). */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1 && bits * n <= 63, s"zkey: $n cols x $bits bits > 63")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear min/max normalization of a numeric column onto
    * `[0, 2^bits)` — the cheap stand-in for rank normalization
    * (Delta uses range-partition ids; with heavy skew substitute
    * `approxQuantile` cut points for `lo`/`hi`). */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1 << bits
    val scaled = ((c.cast("double") - lo) / lit(math.max(hi - lo, Double.MinPositiveValue))) * buckets
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit((buckets - 1).toLong))
  }

  /** Rewrite the parquet dir `src` to `dest`, clustered into `nFiles`
    * files z-ordered on numeric columns `cols` (min/max normalized from
    * the data in one stats pass). Like [[Lake.compactTo]] this writes
    * to a fresh directory; the atomic swap is the caller's rename. */
  def clusterTo(spark: SparkSession, src: String, dest: String,
                cols: Seq[String], nFiles: Int, bits: Int = 12): Unit = {
    val df = spark.read.parquet(src)
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      normalize(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    df.withColumn("__zkey", zkey(normalized, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(dest)
  }

  /** Data-skipping evidence: per-file [min, max] of `c` under `dir`,
    * as (file, min, max) — the stats a lakehouse manifest would hold.
    * Driver-side work is O(files), not O(rows). */
  def fileStats(spark: SparkSession, dir: String, c: String): Seq[(String, Double, Double)] = {
    val df = spark.read.parquet(dir)
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
  }

  /** How many files of `dir` a predicate `c BETWEEN lo AND hi` must
    * read, by the min/max stats — the skip count a Delta/Iceberg
    * planner (or parquet row-group pruning) achieves on this layout. */
  def filesOverlapping(spark: SparkSession, dir: String, c: String,
                       lo: Double, hi: Double): Int =
    fileStats(spark, dir, c).count { case (_, fLo, fHi) => fHi >= lo && fLo <= hi }
}
