package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * Parquet scans are the natural 100 TB path: columnar, splittable,
  * min/max-pruned; Catalyst pushes projections and filters into them
  * (visible as `PushedFilters`/`ReadSchema` in `.explain`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` has shipped as TIMESTAMP(NANOS) in some fixture
    * generations and naive µs (→ Spark TIMESTAMP_NTZ) in others;
    * normalize both to session-zone TIMESTAMP so downstream
    * `unix_micros`/window functions accept it in every generation.
    * Nanos are read as long and truncated to µs — the same truncation
    * DuckDB applies converting ns → its native µs timestamps; the
    * NTZ→LTZ cast is value-identity under the UTC session zone, which
    * is also how DuckDB reads the naive µs file — oracle comparisons
    * stay exact either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, NOT `/`: long/int goes through double and loses
        // precision at epoch-nanosecond magnitude (~1.7e18 > 2^53)
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a narrow scan across cores ONLY when the source provides
    * fewer partitions than the cluster has slots — the small-fixture
    * case (one parquet file = one scan task) ahead of CPU-bound work
    * like shingling or tokenizing. At scale the scan itself already
    * yields thousands of partitions, and this is the identity: a
    * round-robin `repartition` is its own full Exchange of the corpus
    * payload (Catalyst does NOT merge it into a downstream hash
    * shuffle), so it must never run unconditionally on a big input.
    * The partition probe reads plan metadata only — no job runs. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
