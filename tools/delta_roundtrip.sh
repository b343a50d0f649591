#!/usr/bin/env bash
# Delta round-trip check for graft.stream.Sinks.upsertDelta.
#
# This repo's build container ships NO Delta Lake jar, so the MERGE
# seam is proven offline two ways (SinksSpec): the generated statement
# is pinned against Spark's own parser, and the identical call path is
# driven through a file-backed MERGE runner and shown equivalent to
# upsertParquet. This script closes the last gap ON A MACHINE THAT HAS
# THE JAR: it drives the IDENTICAL batch sequence through
#   (a) Sinks.upsertDelta against a REAL Delta table, and
#   (b) Sinks.upsertParquet (the offline stand-in),
# and asserts row-for-row equality — including the stale-version batch
# that must NOT regress a row.
#
# Usage:
#   sbt package                               # build the graft classes
#   tools/delta_roundtrip.sh [delta-version]  # default 4.0.0
#
# Requires: spark-shell (Spark 4.x / Scala 2.13) on PATH, and network
# or a local ivy cache holding io.delta:delta-spark_2.13:<version>.
set -euo pipefail
cd "$(dirname "$0")/.."

DELTA_VERSION="${1:-4.0.0}"
JAR=$(ls target/scala-2.13/*.jar 2>/dev/null | head -1)
[ -n "$JAR" ] || { echo "no jar under target/scala-2.13 — run 'sbt package' first" >&2; exit 1; }
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

spark-shell \
  --jars "$JAR" \
  --packages "io.delta:delta-spark_2.13:${DELTA_VERSION}" \
  --conf spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension \
  --conf spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog.DeltaCatalog \
  --conf spark.sql.shuffle.partitions=8 \
  -i <(cat <<SCALA
import org.apache.spark.sql.SaveMode
import spark.implicits._
import graft.stream.Sinks

val work = "$WORK"
val keys = Seq("k"); val version = Seq("v")

// an empty Delta table with the batch schema, registered for MERGE
Seq.empty[(String, Long, Long)].toDF("k", "v", "x")
  .write.format("delta").mode(SaveMode.Overwrite).save(s"\$work/delta")
spark.sql(s"CREATE TABLE graft_rt USING delta LOCATION '\$work/delta'")

// the exact sequence SinksSpec drives through the file-backed runner,
// including the stale-version batch that must not regress row 'a'
val batches = Seq(
  Seq(("a", 1L, 10L), ("b", 1L, 20L)),
  Seq(("a", 2L, 99L), ("c", 1L, 30L)),
  Seq(("a", 1L, 0L)))
batches.foreach { b =>
  Sinks.upsertDelta(b.toDF("k", "v", "x"), "graft_rt", keys, version)
  Sinks.upsertParquet(b.toDF("k", "v", "x"), s"\$work/plain", keys, version)
}

val d = spark.read.format("delta").load(s"\$work/delta")
  .select("k", "v", "x").as[(String, Long, Long)].collect().sorted.toSeq
val p = spark.read.parquet(s"\$work/plain")
  .select("k", "v", "x").as[(String, Long, Long)].collect().sorted.toSeq
assert(d == p, s"DELTA \$d != PARQUET STAND-IN \$p")
assert(d == Seq(("a", 2L, 99L), ("b", 1L, 20L), ("c", 1L, 30L)),
  s"unexpected merged state: \$d")
println("DELTA ROUND-TRIP OK: " + d.mkString(", "))
sys.exit(0)
SCALA
)
