package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.batch.Lake

/** Directory partitioning must turn a date predicate into partition
  * pruning: the scan's PartitionFilters select one directory and the
  * other days' files are never opened. */
class LakeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("date-partitioned events: predicate prunes to one partition") {
    val dir = Files.createTempDirectory("graft_lake").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Lake.writeEventsByDay(ev, dir)

    val allDays = spark.read.parquet(dir).select("event_date").distinct().count()
    assert(allDays > 1, "fixture must span multiple days for this test to mean anything")

    val oneDay = spark.read.parquet(dir)
      .filter(col("event_date") === spark.read.parquet(dir)
        .agg(min("event_date")).collect().head.getDate(0))
    val scans = collectWithSubqueries(oneDay.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected PartitionFilters on event_date, got:\n$scan")
    // pruning happened before reading: selected files belong to exactly
    // one partition directory out of allDays
    val selectedDirs = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values).distinct.size
    assert(selectedDirs == 1, s"expected 1 pruned partition, got $selectedDirs of $allDays")
    // and the data read back is exactly that day's rows
    val expected = ev.withColumn("event_date", to_date(col("ts")))
    val minDay = expected.agg(min("event_date")).collect().head.getDate(0)
    assert(oneDay.count() === expected.filter(col("event_date") === minDay).count())
  }

  test("dynamic partition pruning: dim-filtered join prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Lake.writeEventsByDay(ev, s"$dir/fact")

    // a dates dim with a non-partition attribute; only the dim filter
    // (not any literal on the fact) selects the day — pruning must come
    // from the join at runtime. NB the filter must be a comparison
    // (Catalyst's isLikelySelective), not a bare boolean attribute.
    val minDay = spark.read.parquet(s"$dir/fact")
      .agg(min("event_date")).collect().head.getDate(0)
    spark.read.parquet(s"$dir/fact").select("event_date").distinct()
      .withColumn("kind",
        when(col("event_date") === lit(minDay), "special").otherwise("normal"))
      .write.parquet(s"$dir/dim")

    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("kind") === "special")
    val joined = fact.join(dim, "event_date").groupBy("event_type").count()
    joined.collect() // execute so AQE finalizes the plan

    val scans = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case s: FileSourceScanExec if s.relation.location.rootPaths.head.toString.contains("fact") => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"expected a runtime DPP filter on the fact scan, got: ${scans.head.partitionFilters}")
    assert(joined.agg(sum("count")).collect().head.getLong(0)
      === fact.filter(col("event_date") === lit(minDay)).count())
  }

  test("compaction re-bins many small files into few") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // simulate a streaming sink's small-file debris: 64 appends
    ev.repartition(64).write.parquet(s"$dir/src")
    val (before, after) = Lake.compactTo(spark, s"$dir/src", s"$dir/dst")
    assert(before >= 64, s"precondition: many small files, got $before")
    assert(after < before / 8, s"expected compaction, got $before -> $after")
    // content preserved
    assert(spark.read.parquet(s"$dir/dst").count() === ev.count())
  }

  test("incremental bookkeeping: only new partitions surface; re-runs are no-ops") {
    val dir = Files.createTempDirectory("graft_incr").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
    val days = ev.select("event_date").distinct().orderBy("event_date")
      .collect().map(_.getDate(0))
    assert(days.length > 1)

    // day 1 lands, gets processed and marked
    ev.filter(col("event_date") === days.head)
      .write.partitionBy("event_date").mode("append").parquet(s"$dir/data")
    val round1 = Lake.unprocessedPartitions(spark, s"$dir/data", s"$dir/ledger", "event_date")
    assert(round1.collect().map(_.getDate(0)).toSeq == Seq(days.head))
    Lake.markProcessed(round1, s"$dir/ledger", "event_date")

    // crash-retry between batches: nothing new → empty, not re-emitted
    assert(Lake.unprocessedPartitions(spark, s"$dir/data", s"$dir/ledger", "event_date").isEmpty)

    // the remaining days land: exactly those surface, day 1 does not
    ev.filter(col("event_date") =!= days.head)
      .write.partitionBy("event_date").mode("append").parquet(s"$dir/data")
    val round2 = Lake.unprocessedPartitions(spark, s"$dir/data", s"$dir/ledger", "event_date")
    assert(round2.collect().map(_.getDate(0)).toSet == days.tail.toSet)
    Lake.markProcessed(round2, s"$dir/ledger", "event_date")
    // double-mark is harmless (append-only ledger, anti-join consult)
    Lake.markProcessed(round2, s"$dir/ledger", "event_date")
    assert(Lake.unprocessedPartitions(spark, s"$dir/data", s"$dir/ledger", "event_date").isEmpty)
  }
}
