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
}
