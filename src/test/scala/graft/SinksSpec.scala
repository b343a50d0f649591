package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.stream.Sinks

/** Upsert + dedup-append sink behavior (K1-K5, K4). */
class SinksSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
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

  test("upsertParquetBucketed: newest wins; untouched buckets not rewritten") {
    val dir = Files.createTempDirectory("graft_upsertb").toString + "/t"
    val nB = 8
    // seed: 200 keys spread across all buckets
    val seed = (0 until 200).map(i => (s"k$i", 1L, i.toLong))
    Sinks.upsertParquetBucketed(seed.toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nB)
    val before = new java.io.File(dir).listFiles().filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.lastModified)).toSet).toMap
    assert(before.size == nB, s"expected all $nB buckets populated")

    // upsert 3 keys (newer version) + 1 new key
    Sinks.upsertParquetBucketed(
      Seq(("k5", 2L, 999L), ("k6", 2L, 998L), ("k7", 0L, 0L), ("kNEW", 1L, 777L))
        .toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nB)

    val got = Sinks.readUpsertedBucketed(spark, dir)
      .select("k", "x").as[(String, Long)].collect().toMap
    assert(got.size == 201)
    assert(got("k5") == 999L && got("k6") == 998L)
    assert(got("k7") == 7L, "older version must not regress the row")
    assert(got("kNEW") == 777L && got("k0") == 0L)

    // only the buckets containing the 4 batch keys were rewritten
    val touched = Seq("k5", "k6", "k7", "kNEW").toDF("k")
      .select(pmod(hash(col("k")), lit(nB))).as[Int].collect()
      .map(b => s"__bucket=$b").toSet
    val after = new java.io.File(dir).listFiles().filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.lastModified)).toSet).toMap
    before.foreach { case (bucket, files) =>
      if (!touched(bucket))
        assert(after(bucket) == files, s"untouched $bucket was rewritten")
      else assert(after(bucket) != files, s"touched $bucket unchanged")
    }
  }

  test("upsertParquetBucketed: changing nBuckets on an existing table is refused") {
    val dir = Files.createTempDirectory("graft_upsertb2").toString + "/t"
    Sinks.upsertParquetBucketed(
      Seq(("a", 1L, 1L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetBucketed(
        Seq(("b", 1L, 2L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nBuckets = 16)
    }
    assert(e.getMessage.contains("nBuckets=8"))
  }

  test("upsertParquetBucketed: refuses a flat table; migrateToBucketed adopts it") {
    val dir = Files.createTempDirectory("graft_upsertb3").toString + "/t"
    // a round-3-era flat table written by the non-bucketed upsert
    Sinks.upsertParquet(
      Seq(("a", 1L, 10L), ("b", 1L, 20L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"))
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetBucketed(
        Seq(("c", 1L, 30L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nBuckets = 8)
    }
    assert(e.getMessage.contains("migrateToBucketed"))
    // the refused call must not have poisoned the table with a marker
    assert(spark.read.parquet(dir).count() == 2)

    Sinks.migrateToBucketed(spark, dir, Seq("k"), nBuckets = 8)
    Sinks.upsertParquetBucketed(
      Seq(("a", 2L, 99L), ("c", 1L, 30L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), 8)
    val got = Sinks.readUpsertedBucketed(spark, dir)
      .select("k", "x").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 99L, "b" -> 20L, "c" -> 30L))
  }

  test("upsertParquetBucketed: first write to a fresh table succeeds (default path)") {
    // regression: the marker used to materialize the dir before the first
    // data write, and the merge-read then died on UNABLE_TO_INFER_SCHEMA
    val dir = Files.createTempDirectory("graft_upsertb4").toString + "/t"
    Sinks.upsertParquetBucketed(
      Seq(("a", 1L, 1L)).toDF("k", "v", "x"), dir, Seq("k"), Seq("v"))
    assert(Sinks.readUpsertedBucketed(spark, dir).count() == 1)
  }

  test("lookupBucketed: point lookup partition-prunes to one bucket") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("graft_lookup").toString + "/t"
    val nB = 8
    val seed = (0 until 200).map(i => (s"k$i", 1L, i.toLong))
    Sinks.upsertParquetBucketed(seed.toDF("k", "v", "x"), dir, Seq("k"), Seq("v"), nB)

    val res = Sinks.lookupBucketed(spark, dir, Seq("k"), Seq("k42"))
    assert(res.select("x").as[Long].collect().toSeq == Seq(42L))
    // the lookup must reach the scan as a PARTITION filter (one
    // __bucket= dir opened), not as a data filter over the whole table
    val qe = res.queryExecution
    qe.toRdd.count() // execute so the scan's numFiles metric is populated
    val scans = qe.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "bucket predicate did not become a partition filter")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val filesTotal = spark.read.parquet(dir).inputFiles.length
    assert(filesRead < filesTotal,
      s"lookup read $filesRead of $filesTotal files — no pruning happened")
  }

  test("lookupBucketed: literal type narrower than the stored key still finds the row") {
    val dir = Files.createTempDirectory("graft_lookup_t").toString + "/t"
    val seed = (0 until 100).map(i => (i.toLong, 1L, i.toString))
    Sinks.upsertParquetBucketed(seed.toDF("id", "v", "x"), dir, Seq("id"), Seq("v"), 8)
    // probe with Int literals against the Long key column: Murmur3 over
    // 4 bytes != over 8 bytes, so an uncast literal would prune to the
    // WRONG __bucket= partition and silently return nothing
    (40 to 44).foreach { i =>
      val got = Sinks.lookupBucketed(spark, dir, Seq("id"), Seq(i)) // Int vs Long
        .select("x").as[String].collect().toSeq
      assert(got == Seq(i.toString), s"lookup for id=$i returned $got")
    }
  }

  test("mergeSql: refuses empty key/version; escaped identifiers still parse") {
    import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
    val e = intercept[IllegalArgumentException] {
      Sinks.mergeSql("t", "s", Seq("k", "v"), Seq("k"), Nil)
    }
    assert(e.getMessage.contains("version"))
    // an empty version seq used to render `WHEN MATCHED AND ()` — a
    // runtime parse failure; reserved words / spaces in identifiers
    // used to break the statement entirely
    val sql = Sinks.mergeSql("lake.select", "src",
      Seq("record id", "order", "ts"), Seq("record id"), Seq("ts"))
    assert(spark.sessionState.sqlParser.parsePlan(sql).isInstanceOf[MergeIntoTable])
  }

  test("upsertDelta: generated MERGE parses to the expected plan shape") {
    import org.apache.spark.sql.catalyst.plans.logical.{InsertAction, MergeIntoTable, UpdateAction}
    val sql = Sinks.mergeSql("lake.production_records", "src",
      Seq("record_id", "produced", "ts", "rank"), Seq("record_id"), Seq("ts", "rank"))
    val m = spark.sessionState.sqlParser.parsePlan(sql).asInstanceOf[MergeIntoTable]
    assert(m.mergeCondition.sql.toLowerCase.contains("record_id"))
    m.matchedActions match {
      case Seq(UpdateAction(Some(cond), assigns, _)) =>
        assert(assigns.size == 4)
        // strictly-newer guard, lexicographic over (ts, rank)
        val c = cond.sql.toLowerCase
        assert(c.contains("ts") && c.contains("rank"))
      case other => fail(s"expected one conditional UPDATE, got $other")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) => assert(assigns.size == 4)
      case other => fail(s"expected one unconditional INSERT, got $other")
    }
    assert(m.notMatchedBySourceActions.isEmpty,
      "MERGE must never touch target rows absent from the batch")
  }

  test("upsertDelta through a file-backed MERGE runner ≡ upsertParquet") {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
    import org.apache.spark.sql.expressions.Window
    val root = Files.createTempDirectory("graft_delta").toString
    val (dirD, dirP) = (s"$root/delta", s"$root/plain")
    val keys = Seq("k"); val version = Seq("v")
    // a stand-in for DeltaTable.merge: takes the GENERATED statement,
    // resolves the source through the parsed plan (proving the temp view
    // is live when the runner fires), applies MERGE row-level semantics
    // to a parquet-backed target
    def fake(sql: String): Unit = {
      val m = spark.sessionState.sqlParser.parsePlan(sql).asInstanceOf[MergeIntoTable]
      val srcName = m.sourceTable.collectFirst {
        case r: UnresolvedRelation => r.multipartIdentifier.last
      }.get
      val src = spark.table(srcName)
      val exists = new java.io.File(dirD).exists
      val merged =
        if (!exists) src.withColumn("__src", lit(1))
        else spark.read.parquet(dirD).withColumn("__src", lit(0))
          .unionByName(src.withColumn("__src", lit(1)))
      // WHEN MATCHED AND strictly-newer → source; tie → target row wins
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy((version.map(c => col(c).desc) :+ col("__src").asc): _*)
      merged.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn", "__src")
        .localCheckpoint()
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dirD)
    }
    val batches = Seq(
      Seq(("a", 1L, 10L), ("b", 1L, 20L)),
      Seq(("a", 2L, 99L), ("c", 1L, 30L)),
      Seq(("a", 1L, 0L))) // stale version: must not regress the row
    batches.foreach { b =>
      Sinks.upsertDelta(b.toDF("k", "v", "x"), "t", keys, version, run = fake)
      Sinks.upsertParquet(b.toDF("k", "v", "x"), dirP, keys, version)
    }
    def slurp(d: String) = spark.read.parquet(d)
      .select("k", "v", "x").as[(String, Long, Long)].collect().sorted.toSeq
    assert(slurp(dirD) == slurp(dirP))
    assert(slurp(dirD) == Seq(("a", 2L, 99L), ("b", 1L, 20L), ("c", 1L, 30L)))
  }

  test("applyActions with epoch id: histories replay is exactly-once") {
    import graft.model.ActionRow
    val outDir = Files.createTempDirectory("graft_hist").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b0 = Seq(
      ActionRow.appendHistory("P1", "AAA", "r1", 10L, 1.5, ts("2024-03-05 09:00:00")))
    val b1 = Seq(
      ActionRow.appendHistory("P1", "AAA", "r1", 14L, 1.6, ts("2024-03-05 09:00:05")))
    Sinks.applyActions(b0.toDS(), outDir, recordBuckets = 0, epochId = 0)
    Sinks.applyActions(b1.toDS(), outDir, recordBuckets = 0, epochId = 1)
    // crash-replay of epoch 1 (restart before checkpoint commit):
    // epoch-dir overwrite replaces, never appends beside
    Sinks.applyActions(b1.toDS(), outDir, recordBuckets = 0, epochId = 1)
    val hist = spark.read.parquet(s"$outDir/histories")
    assert(hist.count() == 2, "replayed epoch must not duplicate history rows")
    assert(hist.agg(sum("quantity")).as[Long].collect().head == 24L)
  }

  test("applyActions adopts a legacy flat histories table before epoch writes") {
    import graft.model.ActionRow
    val outDir = Files.createTempDirectory("graft_hist_l").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // round-4-era layout: plain appends, no epoch dirs
    Sinks.applyActions(Seq(
      ActionRow.appendHistory("P1", "AAA", "r1", 5L, 1.5, ts("2024-03-05 08:00:00"))
    ).toDS(), outDir, recordBuckets = 0) // epochId defaulted: legacy append
    // new layout takes over mid-table; both generations stay readable
    Sinks.applyActions(Seq(
      ActionRow.appendHistory("P1", "AAA", "r1", 7L, 1.5, ts("2024-03-05 09:00:00"))
    ).toDS(), outDir, recordBuckets = 0, epochId = 0)
    val hist = spark.read.parquet(s"$outDir/histories")
    assert(hist.count() == 2)
    assert(hist.agg(sum("quantity")).as[Long].collect().head == 12L)
    assert(hist.select("epoch").as[Long].collect().sorted.toSeq == Seq(-1L, 0L))
  }

  test("appendCsvDedup epoch layout: dedup across batches; replay is exactly-once") {
    val dir = Files.createTempDirectory("graft_csv_e").toString + "/nf"
    val r1 = Seq(("P1", "X", "X/Y", "2024-03-05", "2024-03-05 09:00:00"))
      .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp")
    val r2 = Seq(
      ("P1", "X", "X/Y", "2024-03-06", "2024-03-06 09:00:00"), // new fecha: kept
      ("P1", "X", "OTHER", "2024-03-05", "2024-03-05 10:00:00")) // dup PK: dropped
      .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp")
    Sinks.appendCsvDedup(r1, dir, epochId = 0)
    Sinks.appendCsvDedup(r2, dir, epochId = 1)
    def rows = spark.read.option("header", "true").csv(dir)
    assert(rows.count() == 2)
    assert(rows.select("fecha").as[String].collect().toSet ==
      Set("2024-03-05", "2024-03-06"))
    // crash-replay of epoch 1: OVERWRITE of its CSV + index partitions
    // converges instead of appending a third copy
    Sinks.appendCsvDedup(r2, dir, epochId = 1)
    assert(rows.count() == 2, "epoch replay must not duplicate CSV rows")
  }

  test("appendCsvDedup probe reads the key index, never the accumulated CSV") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Files.createTempDirectory("graft_csv_p").toString + "/nf"
    (0 to 2).foreach { e =>
      Sinks.appendCsvDedup(
        Seq((s"P$e", "X", "X/Y", s"2024-03-0${e + 1}", "t"))
          .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp"),
        dir, epochId = e)
    }
    val probe = Sinks.csvDedupSurvivors(
      Seq(("P0", "X", "X/Y", "2024-03-01", "t"), ("P9", "Y", "Y/Z", "2024-03-09", "t"))
        .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp"),
      dir, epochId = 3)
    assert(probe.select("estacion").as[String].collect().toSeq == Seq("P9"),
      "known key P0 rejected by the index; novel P9 survives")
    val scans = collectWithSubqueries(probe.queryExecution.executedPlan) {
      case sc: FileSourceScanExec => sc
    }
    val idxScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("_nf_idx")))
    assert(idxScans.nonEmpty, "the probe must read the key index")
    assert(idxScans.exists(sc => Seq("In(nf_key", "EqualTo(nf_key")
        .exists(sc.metadata("PushedFilters").contains)),
      s"batch keys must push into the index scan: ${idxScans.map(_.metadata("PushedFilters"))}")
    assert(scans.size == idxScans.size,
      "per-batch read IO must not include the accumulated CSV itself")
  }

  test("appendCsvDedup adopts a flat legacy CSV; its keys still dedup") {
    val dir = Files.createTempDirectory("graft_csv_l").toString + "/nf"
    val legacy = Seq(("P1", "X", "X/Y", "2024-03-05", "t"))
      .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp")
    Sinks.appendCsvDedup(legacy, dir) // epochId = -1: the flat layout
    Sinks.appendCsvDedup(
      Seq(("P1", "X", "OTHER", "2024-03-05", "t2"),  // dup of the legacy PK
          ("P2", "Z", "Z/W", "2024-03-05", "t3"))    // novel
        .toDF("estacion", "numero_parte", "numero_parte_original", "fecha", "timestamp"),
      dir, epochId = 0)
    val got = spark.read.option("header", "true").csv(dir)
    assert(got.count() == 2, "legacy key must reject its dup without a full-CSV read")
    assert(got.select("numero_parte").as[String].collect().toSet == Set("X", "Z"))
    assert(new java.io.File(s"$dir/epoch=-1").isDirectory,
      "flat files must live in an epoch=-1 partition after first contact")
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
