package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.batch.Relational
import graft.plans.{AsOf, AsOfJoinExec, AsOfJoinPlan}

/** The native as-of join (logical plan + strategy + merge exec) —
  * semantics vs the window-based formulation, outer-null behavior,
  * and the probe-filter pushdown rule. */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val sf = "/root/testdata/sf0.001"

  test("unit semantics: latest-at-or-before per key, nulls when none") {
    import spark.implicits._
    val probe = Seq(("a", 10L, "p1"), ("a", 20L, "p2"), ("b", 5L, "p3"), ("c", 9L, "p4"))
      .toDF("k", "t", "pid")
    val ref = Seq(("a", 8L, "r1"), ("a", 15L, "r2"), ("a", 20L, "r3"), ("b", 6L, "r4"))
      .toDF("rk", "rt", "rid")
    val out = AsOf.join(probe, ref, "k", "rk", "t", "rt")
      .select("pid", "rid").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("p1" -> "r1", "p2" -> "r3", "p3" -> null, "p4" -> null))
  }

  test("duplicate reference times: one of the tied rows wins") {
    // which of two equal-(key,time) rows wins depends on shuffle arrival
    // order; the guarantee is only that SOME max-time row matches
    import spark.implicits._
    val probe = Seq(("a", 10L, "p1")).toDF("k", "t", "pid")
    val ref = Seq(("a", 10L, "r1"), ("a", 10L, "r2"), ("a", 5L, "r0"))
      .toDF("rk", "rt", "rid")
    val out = AsOf.join(probe, ref, "k", "rk", "t", "rt")
      .select("rid", "rt").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 10L)
    assert(Set("r1", "r2").contains(out.head.getString(0)))
  }

  test("q29 native == q8 window formulation (restricted to q29's filter)") {
    val q8 = Relational.q8_asof(spark, sf).filter(col("purchase_id") % 2 === 0).collect()
    val q29 = Relational.q29_asof_native(spark, sf).collect()
    assert(q29.length > 0)
    assert(q29.toSeq === q8.toSeq)
  }

  test("plans through AsOfJoinExec; probe filter is pushed below the join") {
    val df = Relational.q29_asof_native(spark, sf)
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsOfJoinExec => e
    }
    assert(execs.size === 1)
    // the optimizer rule must land the purchase_id filter on the probe
    // child of the logical as-of node (i.e. before the shuffle)
    val pushed = df.queryExecution.optimizedPlan.collect {
      case j: AsOfJoinPlan => j.left.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.references.map(_.name).exists(_ == "purchase_id") => f
      }.isDefined
    }
    assert(pushed === Seq(true))
    // no Filter remains above the as-of node in the optimized plan
    val above = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.collectFirst { case _: AsOfJoinPlan => () }.isDefined => f
    }
    assert(above.isEmpty)
  }

  test("reference-side predicates are NOT pushed (they'd change 'latest')") {
    import spark.implicits._
    val probe = Seq(("a", 10L, "p1")).toDF("k", "t", "pid")
    val ref = Seq(("a", 5L, 1L), ("a", 8L, 99L)).toDF("rk", "rt", "rid")
    // rid=99 is the latest-at-or-before; filtering rid < 50 AFTER the
    // join must drop the row entirely, NOT fall back to rid=1 (which is
    // what pre-join filtering of the reference side would produce)
    val out = AsOf.join(probe, ref, "k", "rk", "t", "rt").filter($"rid" < 50)
    assert(out.collect().isEmpty)
    // and the optimizer left that filter above the as-of node
    val refFilterBelow = out.queryExecution.optimizedPlan.collect {
      case j: AsOfJoinPlan => j.right.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.isDefined
    }
    assert(refFilterBelow === Seq(false))
  }

  test("mismatched key/time types fail loudly (no analyzer cast net)") {
    import spark.implicits._
    val probe = Seq((1, 10L, "p1")).toDF("k", "t", "pid")       // int key
    val ref = Seq((1L, 5L, "r1")).toDF("rk", "rt", "rid")       // long key
    val e = intercept[IllegalArgumentException] {
      AsOf.join(probe, ref, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key types must match"))
    val probe2 = Seq((1L, 10, "p1")).toDF("k", "t", "pid")      // int time
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(probe2, ref, "k", "rk", "t", "rt")
    }
    assert(e2.getMessage.contains("time types must match"))
  }

  test("ensureRegistered is idempotent") {
    AsOf.ensureRegistered(spark); AsOf.ensureRegistered(spark)
    val em = org.apache.spark.sql.graftshim.PlanBridge.experimental(spark)
    assert(em.extraStrategies.count(_.isInstanceOf[graft.plans.AsOfJoinStrategy]) === 1)
    assert(em.extraOptimizations.count(_ == graft.plans.PushProbeFilterThroughAsOfJoin) === 1)
  }

  test("randomized: merge exec == window-formulation reference, 20 rounds") {
    // the merge iterator carries cross-row state (lookahead, matched,
    // matchedKey); randomized keys/times with heavy duplication probe the
    // key-boundary and equal-time paths a fixture won't
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 20) {
      val nKeys = 1 + rnd.nextInt(5)
      val probe = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong)).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      // distinct (key,time) pairs: with duplicates the winner depends on
      // shuffle arrival order (not a semantic the exec guarantees — see
      // the duplicate-times unit test)
      val ref = Seq.fill(rnd.nextInt(60))(
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong))
        .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val probeDf = probe.toDF("k", "t", "pid")
      val refDf = ref.toDF("rk", "rt", "rid")

      val got = AsOf.join(probeDf, refDf, "k", "rk", "t", "rt")
        .select($"pid", $"rid").as[(Long, Option[Long])].collect().toMap

      // reference semantics, computed directly: latest (rt, rid) <= t
      val byKey = ref.groupBy(_._1)
      val want = probe.map { case (k, t, pid) =>
        val cands = byKey.getOrElse(k, Nil).filter(_._2 <= t)
        pid -> cands.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got === want, s"round $round mismatch (nKeys=$nKeys)")
    }
  }

  test("probe-side partitioning/ordering pass through (no extra exchange)") {
    import spark.implicits._
    val probe = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), col("id").as("t"), col("id").as("pid"))
    val ref = spark.range(0, 100).select(
      (col("id") % 7).as("rk"), (col("id") * 3).as("rt"), col("id").as("rid"))
    // aggregating the join output by the probe key must NOT add a second
    // shuffle on the probe path: AsOfJoinExec preserves child partitioning
    val agg = AsOf.join(probe, ref, "k", "rk", "t", "rt")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val exchanges = collectWithSubqueries(agg.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size === 2) // one per join child, none for the agg
    assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === (0L to 6L).map(k => k -> (1000L / 7 + (if (k < 1000 % 7) 1 else 0))).toMap)
  }
}
