package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.stream.Sinks

/** Upsert + dedup-append sink behavior (K1-K5, K4). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("upsertParquet: newest version wins per key; others untouched") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    Sinks.upsertParquet(
      Seq(("a", 1L, 10L), ("b", 1L, 20L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"))
    Sinks.upsertParquet(
      Seq(("a", 2L, 99L), ("c", 1L, 30L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"))
    val got = spark.read.parquet(dir).orderBy("k")
      .select("k", "x").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 99L), ("b", 20L), ("c", 30L)))
  }

  test("appendCsvDedup: logical-PK dedup across appends (Prensas.py:252-258)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/nf"
    val r1 = Seq(("P1", "X", "X/Y", "2024-03-05", "2024-03-05 09:00:00"))
      .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp")
    Sinks.appendCsvDedup(r1, dir)
    Sinks.appendCsvDedup(r1, dir) // exact duplicate: dropped
    val r2 = Seq(
      ("P1", "X", "X/Y", "2024-03-06", "2024-03-06 09:00:00"), // new fecha: kept
      ("P1", "X", "OTHER", "2024-03-05", "2024-03-05 10:00:00")) // dup PK: dropped
      .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp")
    Sinks.appendCsvDedup(r2, dir)
    val got = spark.read.option("header", "true").csv(dir)
    assert(got.count() == 2)
    assert(got.select("fecha").as[String].collect().toSet ==
      Set("2024-03-05", "2024-03-06"))
  }
}
