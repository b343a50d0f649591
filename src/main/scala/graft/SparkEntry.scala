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

  /** Rewrite bare-name CTE heads to `name AS MATERIALIZED (` — but
    * ONLY inside the statement's WITH prefix. The rewrite walks the
    * CTE list structurally (head, balanced body skipping quoted
    * literals, comma, next head) and stops at the first token that
    * begins the main query, so nothing PAST the CTE list can ever be
    * rewritten — a multi-definition `WINDOW w1 AS (...), w2 AS (...)`
    * clause, a `CAST(x AS (...))`-shaped fragment, anything (the
    * round-12 ADVICE unsoundness of the old regex, which matched any
    * `), name AS (` in the whole statement). Column-list heads
    * (`reach(id, lbl) AS (`) are left inlined — DuckDB rejects
    * MATERIALIZED on a self-referencing CTE — and any statement using
    * RECURSIVE is left untouched entirely (all are sub-second).
    * A head shape the scanner cannot parse bails to the ORIGINAL sql;
    * OracleSqlSpec's whole-map guard (any bare `, name AS (`) then
    * fails in milliseconds instead of silently re-inlining (the
    * round-10 artifact-killer class). */
  private[graft] def materializeCtes(sql: String): String = {
    if (sql.contains("RECURSIVE")) return sql
    val m0 = java.util.regex.Pattern
      .compile("\\A\\s*WITH\\s+", java.util.regex.Pattern.CASE_INSENSITIVE)
      .matcher(sql)
    if (!m0.lookingAt()) return sql // no WITH prefix — no CTEs to touch
    val out = new StringBuilder(sql.substring(0, m0.end()))
    // a head may already carry a hand-written MATERIALIZED (shared
    // fragments annotate multi-referenced CTEs for the RECURSIVE
    // statements this scanner skips) — recognize it and pass through,
    // else the scanner would bail on the whole statement and leave its
    // OTHER bare heads inlined
    val headP = java.util.regex.Pattern.compile(
      "\\s*([a-zA-Z_][a-zA-Z0-9_]*)\\s*(\\([^)]*\\))?\\s+AS\\s*(MATERIALIZED\\s+)?\\(",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    var i = m0.end()
    while (true) {
      val hm = headP.matcher(sql)
      hm.region(i, sql.length)
      if (!hm.lookingAt()) return sql // unparseable head — bail whole
      val headText = sql.substring(i, hm.end())
      out.append(
        if (hm.group(2) != null || hm.group(3) != null) headText
        // column-list head stays inlined; a hand-annotated MATERIALIZED
        // head (group 3) passes through — stated as a branch, not left
        // to the replacement pattern happening not to match
        else headText.replaceFirst("(?is)AS\\s*\\(\\z", "AS MATERIALIZED ("))
      // skip the balanced CTE body; parens inside single-quoted
      // literals ('' escape), double-quoted identifiers, and `--`
      // line comments must not move the depth counter
      var j = hm.end()
      var depth = 1
      while (depth > 0 && j < sql.length) {
        sql.charAt(j) match {
          case '\'' =>
            j += 1
            var closed = false
            while (!closed && j < sql.length) {
              if (sql.charAt(j) == '\'') {
                if (j + 1 < sql.length && sql.charAt(j + 1) == '\'') j += 2
                else { closed = true; j += 1 }
              } else j += 1
            }
          case '"' =>
            j += 1
            while (j < sql.length && sql.charAt(j) != '"') j += 1
            if (j < sql.length) j += 1
          case '-' if j + 1 < sql.length && sql.charAt(j + 1) == '-' =>
            while (j < sql.length && sql.charAt(j) != '\n') j += 1
          case '(' => depth += 1; j += 1
          case ')' => depth -= 1; j += 1
          case _ => j += 1
        }
      }
      if (depth != 0) return sql // unbalanced body — bail whole
      out.append(sql.substring(hm.end(), j))
      var k = j
      while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
      if (k < sql.length && sql.charAt(k) == ',') {
        out.append(sql.substring(j, k + 1)) // whitespace + the comma
        i = k + 1
      } else {
        out.append(sql.substring(j)) // main query begins — untouched
        return out.toString
      }
    }
    sql // unreachable
  }
}
