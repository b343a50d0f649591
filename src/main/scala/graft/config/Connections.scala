package graft.config

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TagConfig

/** Where a dimension table lives: a file path or a JDBC endpoint.
  *
  * The reference reads its config and record tables from SQL Server /
  * AS400 over ODBC (Prensas.py:93-112, 166-169); this engine reaches
  * the same tables through Spark's JDBC source so the scan stays a
  * DataFrame (predicate pushdown into the database, no driver-side
  * cursor loops). File formats cover fixtures and lake-resident dims.
  *
  * For `jdbc`, `location` is the JDBC URL and `options` carries the
  * standard Spark JDBC options (`dbtable` or `query`, `driver`,
  * `user`, `password`, `partitionColumn`/`numPartitions` for large
  * tables).
  */
case class TableRef(format: String, location: String,
    options: Map[String, String] = Map.empty)

object Connections {

  /** Read a table through its configured connection. */
  def read(spark: SparkSession, ref: TableRef): DataFrame = ref.format match {
    case "parquet" => spark.read.options(ref.options).parquet(ref.location)
    case "csv" => spark.read.option("header", "true").options(ref.options).csv(ref.location)
    case "jdbc" => spark.read.format("jdbc")
      .option("url", ref.location).options(ref.options).load()
    case other => throw new IllegalArgumentException(
      s"unsupported table format '$other' (parquet | csv | jdbc)")
  }

  /** S1 config scan through a connection: tag rows in the reference's
    * column shape (work_center, ip, tag, address, block_len) from any
    * supported format — the JDBC case is the reference's `SELECT` at
    * Prensas.py:155-165. */
  def tags(spark: SparkSession, ref: TableRef): Dataset[TagConfig] = {
    import spark.implicits._
    read(spark, ref)
      .select(col("work_center").as("workCenter"), col("ip"), col("tag"),
        col("address"), col("block_len").cast("int").as("blockLen"))
      .as[TagConfig]
  }
}
