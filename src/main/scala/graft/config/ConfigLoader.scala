package graft.config

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.functions.PlcFunctions._

/** Config plane: tag rows → per-IP reader groups and per-(station, side)
  * decode layouts (load_config + ip_groups, Prensas.py:151-208).
  *
  * The A2 aggregation: group config rows by IP into a nested struct with
  * the station list, port/series scalars (defaults 1025 / 'Q',
  * Prensas.py:180-182), and the deduped union of all expanded register
  * addresses (Prensas.py:201) — plus an md5 config hash per group for
  * the supervisor's change detection (F10, Prensas.py:849).
  */
object ConfigLoader {

  /** Nested per-IP group frame from TagConfig rows. */
  def ipGroups(spark: SparkSession, tags: Dataset[TagConfig]): DataFrame = {
    val t = tags.toDF()
      .withColumn("tagLower", lower(col("tag")))
    t.groupBy(col("ip"))
      .agg(
        coalesce(first(when(col("tagLower") === "puerto", col("address").cast("int")),
          ignoreNulls = true), lit(1025)).as("port"),
        coalesce(first(when(col("tagLower") === "serie plc", col("address")),
          ignoreNulls = true), lit("Q")).as("serie"),
        sort_array(collect_set(when(!col("tagLower").isin("puerto", "serie plc"),
          col("workCenter")))).as("estaciones"),
        sort_array(array_distinct(flatten(collect_list(
          when(!col("tagLower").isin("puerto", "serie plc"),
            expandBlock(col("address"), col("blockLen"))).otherwise(array()))))).as("allAddresses"))
      .withColumn("configHash", configHash(struct(
        col("port"), col("serie"), col("estaciones"), col("allAddresses"))))
  }

  /** Per-(station, side) decode layout: one counter word, one optional
    * cycle-time word, one multi-word part block (SURVEY E2 alignment
    * note — fixes the reference's latent `long > 1` misalignment). */
  def stationSides(spark: SparkSession, tags: Dataset[TagConfig]): Seq[StationSideConfig] = {
    import spark.implicits._
    val t = tags.toDF()
      .withColumn("tagLower", lower(col("tag")))
      .filter(!col("tagLower").isin("puerto", "serie plc"))
      .withColumn("side", upper(substring_index(col("tag"), " ", -1)))
      .filter(col("side").isin("LH", "RH"))
      .withColumn("kind",
        when(col("tagLower").startsWith("contador"), "counter")
          .when(col("tagLower").startsWith("tiempo ciclo"), "tiempo")
          .when(col("tagLower").startsWith("número de parte") ||
            col("tagLower").startsWith("numero de parte"), "part"))
      .filter(col("kind").isNotNull)
    t.groupBy(col("ip"), col("workCenter").as("station"), col("side"))
      .agg(
        first(when(col("kind") === "counter", col("address")), ignoreNulls = true).as("counterAddr"),
        first(when(col("kind") === "tiempo", col("address")), ignoreNulls = true).as("tiempoAddr"),
        first(when(col("kind") === "part",
          expandBlock(col("address"), col("blockLen"))), ignoreNulls = true).as("partAddrs"))
      .filter(col("counterAddr").isNotNull) // side requires a counter (Prensas.py:525-526)
      .withColumn("partAddrs", coalesce(col("partAddrs"), array()))
      .as[StationSideConfig].collect().toSeq
  }
}
