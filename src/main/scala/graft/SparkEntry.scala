package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of all operator modules; every key has a
  * DuckDB oracle in `oracleSql` unless the result is not
  * SQL-expressible (those get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Production summary: shift-classified events → per-station top part
    * (the reference's core reporting query, Prensas.py:285-302 + 653-659).
    */
  def entry(spark: SparkSession): DataFrame =
    batch.Relational.q2_top1_shift(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    batch.Relational.queries ++ batch.Dedup.queries ++ batch.TextOps.queries ++
      batch.Similarity.queries ++ batch.Multimodal.queries ++ batch.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    batch.Relational.oracle ++ batch.Dedup.oracle ++ batch.TextOps.oracle ++
      batch.Similarity.oracle ++ batch.Multimodal.oracle ++ batch.Curation.oracle
}
