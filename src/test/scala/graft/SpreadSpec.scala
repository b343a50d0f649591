package graft

import org.apache.spark.sql.catalyst.plans.logical.Repartition

/** [[Tables.spread]]: fan a narrow scan across cores, but NEVER pay a
  * round-robin Exchange on an input that is already wide — the
  * 100 TB-scale contract (a full-corpus repartition before the text
  * pipelines would shuffle the whole text payload once per query). */
class SpreadSpec extends SparkSpec {

  test("identity on an already-wide input: no Repartition, no round-robin Exchange") {
    val n = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, n * 2).toDF("id")
    val out = Tables.spread(wide)
    // strongest form: spread returns the input untouched
    assert(out eq wide, "spread must be the identity on a wide input")
    val repartitions = out.queryExecution.optimizedPlan.collect {
      case r: Repartition => r
    }
    assert(repartitions.isEmpty, "no round-robin shuffle may appear in the plan")
    assert(!out.queryExecution.executedPlan.toString.toLowerCase.contains("roundrobin"))
  }

  test("widens a narrow input to defaultParallelism") {
    val n = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 1000, 1, 1).toDF("id")
    val out = Tables.spread(narrow)
    assert(out.rdd.getNumPartitions == n)
    // and the data is intact
    assert(out.count() == 1000L)
  }
}
