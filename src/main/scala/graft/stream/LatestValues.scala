package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.PartObservation

/** K7: the latest-value view (`plc_data_latest`, Prensas.py:76,582) as
  * a streaming aggregation materialized to an in-memory table — one row
  * per (station, parte) holding the newest observation by event time
  * (`max_by`, deterministic; not arrival order).
  */
object LatestValues {
  def start(obs: Dataset[PartObservation], tableName: String): StreamingQuery =
    obs.groupBy(col("station"), col("parte"))
      .agg(max_by(col("contador"), col("ts")).as("contador"),
        max_by(col("tiempo"), col("ts")).as("tiempo"),
        max(col("ts")).as("ts"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .start()
}
