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
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every CTE is forced `AS MATERIALIZED`: DuckDB inlines CTEs by
    * default, so a CTE referenced k times re-evaluates k times — qc2's
    * composed oracle (quality → dedup → decontam → phash chain
    * referenced multiply downstream) ran 1,629 s at sf0.01 under
    * inlining vs 0.3 s materialized, and the round-10 driver recorded
    * an empty correctness artifact because of it. Materialization is
    * semantics-preserving (same rows); it only pins single evaluation.
    */
  def oracleSql: Map[String, String] =
    (batch.Relational.oracle ++ batch.Dedup.oracle ++ batch.TextOps.oracle ++
      batch.Similarity.oracle ++ batch.Multimodal.oracle ++ batch.Curation.oracle)
      .map { case (k, sql) => k -> materializeCtes(sql) }

  /** Rewrite bare-name CTE heads to `name AS MATERIALIZED (`. Matched
    * head positions: line start, after `WITH `, after a closing paren +
    * comma (`), name AS (` — a CTE list continued on one line), and a
    * leading-comma line (`  , name AS (`). Column-list heads
    * (`reach(id, lbl) AS (`) are left inlined — DuckDB rejects
    * MATERIALIZED on a self-referencing CTE — and any statement using
    * RECURSIVE is left untouched entirely (all are sub-second).
    * OracleSqlSpec's whole-map guard uses a STRICTLY BROADER regex
    * (any `, name AS (`), so a head shape this rewrite misses fails
    * the spec instead of silently re-inlining (the round-10 failure
    * class). The only non-CTE `name AS (` in the corpus is a single
    * `WINDOW w AS (…)` clause, which none of these contexts match. */
  private[graft] def materializeCtes(sql: String): String =
    if (sql.contains("RECURSIVE")) sql
    else sql.replaceAll(
      "(?m)(^[ \\t]*,[ \\t]*|^|WITH |\\),[ \\t\\n]*)([a-zA-Z_][a-zA-Z0-9_]*) AS \\(",
      "$1$2 AS MATERIALIZED (")
}
