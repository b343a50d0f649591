package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-SQL materialization rewrite — the round-11 fix for
  * the artifact killer: DuckDB inlines CTEs by default, so a CTE
  * referenced k times re-evaluates k times, and qc2's composed oracle
  * ran 1,629 s at sf0.01 inlined vs 0.2 s materialized (it zeroed the
  * whole round-10 correctness artifact). These tests are pure string
  * checks — no Spark session — so a regression in the rewrite (or a
  * new oracle written in a shape the rewrite misses) fails in
  * milliseconds, not in a 27-minute driver run. */
class OracleSqlSpec extends AnyFunSuite {

  test("every multi-CTE oracle is emitted with materialized CTEs") {
    val sqls = SparkEntry.oracleSql
    // the composed artifact-killer and its production twin
    for (q <- Seq("qc1_curation", "qc2_multimodal_curation", "qc4_multimodal_wide")) {
      val sql = sqls(q)
      assert(sql.contains("WITH corpus AS MATERIALIZED ("), q)
      assert(!sql.matches("(?s).*\\bclean AS \\(.*"),
        s"$q still has an unmaterialized CTE head")
    }
    // across the whole map: a bare-name CTE head that is NOT
    // materialized may only appear in RECURSIVE statements, which the
    // rewrite deliberately skips. This guard is STRICTLY BROADER than
    // the rewrite regex — it also flags `, name AS (` after ANY comma,
    // not just the shapes the rewrite knows — so a new oracle written
    // in a head shape the rewrite misses fails here in milliseconds
    // instead of re-inlining silently (the round-10 artifact killer).
    val bareHead = "(?m)(^|WITH |,[ \\t\\n]*)([a-zA-Z_][a-zA-Z0-9_]*) AS \\(".r
    for ((name, sql) <- sqls if !sql.contains("RECURSIVE")) {
      assert(bareHead.findFirstIn(sql).isEmpty,
        s"$name has an unmaterialized bare-name CTE head")
    }
  }

  test("mid-line CTE heads after a comma are materialized too") {
    // the round-11 ADVICE gap: `WITH a AS (...), b AS (...)` on one
    // line left b inlined; both leading-comma and after-paren-comma
    // styles must now be rewritten
    val oneLine = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM b")
    assert(oneLine.contains("a AS MATERIALIZED (SELECT 1)"))
    assert(oneLine.contains("b AS MATERIALIZED (SELECT 2)"), oneLine)
    // a head hand-annotated MATERIALIZED (shared fragments do this for
    // their RECURSIVE consumers) passes through unchanged AND must not
    // bail the scan — the bare head after it still gets rewritten
    val preAnnotated = SparkEntry.materializeCtes(
      "WITH a AS MATERIALIZED (SELECT 1), b AS (SELECT 2) SELECT * FROM b")
    assert(preAnnotated.contains("a AS MATERIALIZED (SELECT 1)"), preAnnotated)
    assert(!preAnnotated.contains("MATERIALIZED MATERIALIZED"), preAnnotated)
    assert(preAnnotated.contains("b AS MATERIALIZED (SELECT 2)"), preAnnotated)
    val leadingComma = SparkEntry.materializeCtes(
      "WITH a AS (\n  SELECT 1\n)\n, b AS (SELECT 2)\nSELECT * FROM b")
    assert(leadingComma.contains("b AS MATERIALIZED (SELECT 2)"), leadingComma)
    // a column-list head after a comma stays plain (DuckDB seeds)
    val colList = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1), seed(x, y) AS (VALUES (1, 2)) SELECT * FROM seed")
    assert(colList.contains("seed(x, y) AS (VALUES"), colList)
    // the single WINDOW clause shape in the corpus is untouched
    val win = SparkEntry.materializeCtes(
      "SELECT sum(x) OVER w FROM t\nWINDOW w AS (PARTITION BY k ORDER BY x)")
    assert(!win.contains("MATERIALIZED"), win)
  }

  test("the rewrite stops at the end of the WITH prefix (scanner soundness)") {
    // the round-12 ADVICE case: a multi-definition WINDOW clause in
    // the MAIN query must never be rewritten, even though its second
    // definition sits in the old regex's `), name AS (` context
    val multiWin = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1)\nSELECT sum(x) OVER w1 FROM a\n" +
        "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y)")
    assert(multiWin.contains("a AS MATERIALIZED (SELECT 1)"), multiWin)
    assert(multiWin.contains("w2 AS (ORDER BY y)") &&
      !multiWin.contains("w2 AS MATERIALIZED"), multiWin)
    // parens inside string literals must not derail the body walk
    val lit = SparkEntry.materializeCtes(
      "WITH a AS (SELECT '(' AS p, '''(' AS q), b AS (SELECT 2) SELECT * FROM b")
    assert(lit.contains("a AS MATERIALIZED (") && lit.contains("b AS MATERIALIZED ("), lit)
    // a statement with no WITH prefix is returned verbatim
    val plain = "SELECT a AS (FROM_IS_INVALID) -- not really SQL"
    assert(SparkEntry.materializeCtes(plain) eq plain)
    // parens inside `--` comments and double-quoted identifiers must
    // not move the body-walk depth counter (a ')' in a comment would
    // otherwise end the body early and rewrite mid-body text)
    val cmt = SparkEntry.materializeCtes(
      "WITH a AS (SELECT 1 -- note: closes )\n , x AS (SELECT 9)\n)," +
        " b AS (SELECT \"weird ) name\" FROM t) SELECT * FROM b")
    assert(cmt.contains("a AS MATERIALIZED (") && cmt.contains("b AS MATERIALIZED ("), cmt)
    assert(!cmt.contains("x AS MATERIALIZED"), cmt) // mid-body, inside a's parens
  }

  test("the rewrite never corrupts a WINDOW clause (over-rewrite guard)") {
    // the after-paren-comma alternative WOULD match a multi-definition
    // window list ('WINDOW w1 AS (...), w2 AS (...)') and emit invalid
    // SQL; the corpus has only single-definition WINDOW clauses, and
    // this pins both facts so a future multi-window oracle fails here
    // in milliseconds instead of at DuckDB execution time
    val overRewrite = "(?is)WINDOW\\s+\\w+\\s+AS\\s+MATERIALIZED".r
    // conservative by design: flag ANY `, name AS (` after a WINDOW
    // keyword — nested parens inside the first window definition
    // (function calls in PARTITION BY/ORDER BY) must not let a second
    // definition slip past; nothing valid can follow a WINDOW clause
    // with that shape except another window definition
    val multiWindow = "(?is)\\bWINDOW\\b.*,\\s*\\w+\\s+AS\\s*\\(".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      assert(overRewrite.findFirstIn(sql).isEmpty,
        s"$name: materializeCtes corrupted a WINDOW clause")
      assert(multiWindow.findFirstIn(sql).isEmpty,
        s"$name: multi-definition WINDOW clause — the CTE rewrite would corrupt it; " +
          "split into separate WINDOW clauses or extend materializeCtes first")
    }
  }

  test("RECURSIVE statements and column-list heads stay untouched") {
    val qd6 = SparkEntry.oracleSql("qd6_dup_clusters")
    assert(qd6.contains("WITH RECURSIVE"))
    // the self-referencing CTE keeps its plain head — DuckDB rejects
    // MATERIALIZED on a recursive CTE
    assert(qd6.contains("reach(id, lbl) AS ("))
    assert(!qd6.contains("reach(id, lbl) AS MATERIALIZED"))
    // column-list heads elsewhere (VALUES tables, seeds) stay plain
    val qt1 = SparkEntry.oracleSql.values.find(_.contains("prof(plang, word)"))
    qt1.foreach(sql => assert(!sql.contains("prof(plang, word) AS MATERIALIZED")))
  }

  test("materializeCtes is idempotent and leaves non-CTE AS alone") {
    val once = SparkEntry.materializeCtes("WITH a AS (SELECT 1), b AS (SELECT 2)\nSELECT x AS (weird) FROM a")
    assert(once.startsWith("WITH a AS MATERIALIZED (SELECT 1)"))
    // round 11 documented this miss; round 12 closes it
    assert(once.contains("b AS MATERIALIZED (SELECT 2)"), once)
    assert(SparkEntry.materializeCtes(once) === once,
      "re-running the rewrite must not double-materialize")
  }
}
