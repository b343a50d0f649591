package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IO format coverage beyond parquet/CSV: ORC and JSON-lines
  * roundtrips with explicit schemas (never inference on the read path —
  * inference is a full extra scan at 100 TB), plus parquet schema
  * evolution via mergeSchema, the lakehouse concern when a producer
  * adds a column mid-stream. */
class FormatsSpec extends SparkSpec {

  private lazy val src = Tables.nation(spark, "/root/testdata/sf0.001")

  test("ORC roundtrip preserves rows and schema") {
    val dir = Files.createTempDirectory("fmt_orc").toString
    src.write.mode(SaveMode.Overwrite).orc(dir)
    val back = spark.read.schema(src.schema).orc(dir)
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(src.orderBy("n_nationkey").collect()))
  }

  test("JSON-lines roundtrip with explicit schema (no inference scan)") {
    val dir = Files.createTempDirectory("fmt_json").toString
    src.write.mode(SaveMode.Overwrite).json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() == src.count())
    assert(back.agg(sum("n_nationkey")).head().getLong(0)
      == src.agg(sum("n_nationkey")).head().getLong(0))
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val dir = Files.createTempDirectory("fmt_evolve").toString
    src.select("n_nationkey", "n_name")
      .write.mode(SaveMode.Append).parquet(dir)
    src.select(col("n_nationkey"), col("n_regionkey"),
        lit("v2").as("writer_version"))
      .write.mode(SaveMode.Append).parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "n_regionkey", "writer_version"))
    // old-file rows surface the new columns as nulls, not as errors
    val old = merged.filter(col("writer_version").isNull)
    assert(old.count() == src.count())
    assert(old.filter(col("n_name").isNull).count() == 0)
  }
}
