package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.config.ConfigLoader
import graft.model._

/** Runnable end-to-end example of the streaming pipeline: tag config →
  * decode layout → register readings → decode → state machine → sinks.
  * `sbt "runMain graft.stream.PipelineDemo /tmp/graft_demo"` then
  * inspect `production_records/`, `histories/`, `parts_not_found/`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // config plane: tag rows → per-IP groups + decode layout
    val tags = Seq(
      TagConfig("PRENSA1", "10.0.0.1", "puerto", "2025", 1),
      TagConfig("PRENSA1", "10.0.0.1", "Contador LH", "D3100", 1),
      TagConfig("PRENSA1", "10.0.0.1", "Tiempo Ciclo LH", "D3101", 1),
      TagConfig("PRENSA1", "10.0.0.1", "Número de Parte LH", "D3200", 2))
    ConfigLoader.ipGroups(spark, tags.toDS()).show(truncate = false)
    val layout = ConfigLoader.stationSides(spark, tags.toDS())

    // ingest: one snapshot per PLC tick, as a DSv2 PLC source would
    // emit ("AB12" = words 16961, 12849)
    def tick(t: String, cnt: Int): RegisterSnapshot =
      RegisterSnapshot("10.0.0.1", Timestamp.valueOf(t), Map(
        "D3100" -> cnt, "D3101" -> 1500,
        "D3200" -> ('A'.toInt + 'B'.toInt * 256),
        "D3201" -> ('1'.toInt + '2'.toInt * 256)))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RegisterSnapshot]
    input.addData(tick("2024-03-05 09:00:00", 10), tick("2024-03-05 09:00:01", 13))

    val obs = Decode.decodeSnapshots(spark, input.toDF(), layout)
    val machine = new StateMachine(
      knownParts = Map(("PRENSA1", "AB12") -> 1L),
      multipliers = Map("AB12" -> 2L),
      priorRecords = Map.empty, timeoutMs = 0)
    val q = Sinks.startPipeline(obs, machine, outDir, outDir + "/_ckpt",
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    println("== production_records ==")
    spark.read.parquet(s"$outDir/production_records").show(truncate = false)
    println("== histories ==")
    spark.read.parquet(s"$outDir/histories").show(truncate = false)
    spark.stop()
  }
}
