package graft

import org.apache.spark.sql.functions._

import graft.batch.{Dedup, TextOps}

/** qd19's composed selection: budget respected, cluster-canonical
  * property (never two members of one dup cluster), and the
  * distributed prefix-sum admission ≡ a driver-side sequential fold
  * over the same order.
  */
class SelectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def admittedIds(): Set[Long] = {
    // re-derive the admitted id set from the engine's own pieces, but
    // with a DRIVER-SIDE sequential fold instead of the distributed
    // two-pass prefix sum — the admission arithmetic cross-check
    val labels = Dedup.dupLabels(spark, dir) // already checkpointed
    val keeps = Dedup.qd17_quality_canonical(spark, dir)
      .select(col("keep_id")).collect().map(_.getLong(0)).toSet
    val members = labels.select("id").collect().map(_.getLong(0)).toSet
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), ' '), t -> length(t) > 0)"))
          .cast("long").as("tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scores = TextOps.importanceScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val canon = scores.filter { case (id, _) => !members(id) || keeps(id) }
    var run = 0L
    val adm = collection.mutable.Set.empty[Long]
    for ((id, _) <- canon.sortBy { case (id, imp) => (-imp, id) }) {
      if (run + toks(id) <= Dedup.SelectionBudget) { run += toks(id); adm += id }
      // STOP at the first overflow: the engine's off counts every
      // preceding row INCLUDING rejected ones, so its admitted set is
      // exactly the maximal prefix — a first-fit fold (skip and keep
      // going) would diverge whenever a smaller doc follows a too-big
      // one, and would wrongly reject a correct engine
      else return adm.toSet
    }
    adm.toSet
  }

  test("admission ≡ the sequential fold; budget holds; one member per cluster") {
    val rows = Dedup.qd19_canonical_selection(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum <= Dedup.SelectionBudget)
    val expected = admittedIds()
    // compare via the query's own aggregate shape
    val byLang = Tables.documents(spark, dir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expAgg = expected.groupBy(byLang).map { case (l, ids) =>
      l -> (ids.size.toLong, ids.sum)
    }
    val gotAgg = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(gotAgg === expAgg)
    // cluster-canonical: no two admitted docs share a dup cluster
    val labels = Dedup.dupLabels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clustersHit = expected.toSeq.flatMap(id => labels.get(id))
    assert(clustersHit.size === clustersHit.distinct.size,
      "two admitted docs share a near-dup cluster")
  }
}
