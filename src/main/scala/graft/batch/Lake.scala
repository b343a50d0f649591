package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Lake-layout writers: directory partitioning for coarse pruning.
  *
  * The reference appends everything into flat tables (histories,
  * production_records); at 100 TB the table layout IS the index:
  * partitioning by plan date means a dashboard query for one day
  * touches 1/365th of the files before a single row is read —
  * `PartitionFilters` in the scan node, enforced by LakeSpec. Combine
  * with [[Bucketing]] (sub-file clustering by join key) for the full
  * layout: `date=.../bucket-NNN.parquet`.
  */
object Lake {
  /** Write `df` under `path` hive-partitioned by `cols` (append). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Append).partitionBy(cols: _*).parquet(path)

  /** Events partitioned by event date — the layout the reference's
    * histories table would use at scale. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    writePartitioned(events.withColumn("event_date", to_date(col("ts"))), path, "event_date")
}
