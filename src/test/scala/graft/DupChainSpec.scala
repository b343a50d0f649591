package graft.stream

import org.apache.spark.sql.functions._

/** [[IngestDedup.resolveChains]] under adversarial chain shapes.
  *
  * In-batch dup_of chains are as deep as the duplicate cluster's
  * DIAMETER, not the number of membrane stages: a chained-neighbor LSH
  * cluster (doc k bands only with doc k−1) rejects every member
  * against its immediate predecessor, so a single batch can present a
  * chain thousands of hops deep — the same adversarial shape qd6's
  * large-star/small-star rounds exist for on the batch side. The
  * driver-side resolver must stay O(rows) there (memoized path
  * compression), and a genuine cycle — impossible from the
  * id-decreasing stage order, so corrupted input — must fail loudly
  * rather than spin.
  */
class DupChainSpec extends graft.SparkSpec {
  import spark.implicits._

  test("a 10k-hop chained-neighbor ledger resolves to the terminal winner") {
    // doc k lost to doc k-1 for every k in 1..10000; doc 0 is admitted
    // (absent from the ledger). Every row must resolve to 0.
    val n = 10000
    val rej = (1 to n)
      .map(k => (k.toLong, Option((k - 1).toLong), "near_batch"))
      .toDF("doc_id", "dup_of", "reason")
    val out = IngestDedup.resolveChains(rej)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === n)
    assert(out.values.forall(_ == 0L), "every chain member resolves to doc 0")
    assert(out(n.toLong) === 0L)
  }

  test("mixed chains keep per-row reasons and stop at a null-dup terminal") {
    // 4 -> 3 -> 2(quality, dup_of null): 4 and 3 resolve to 2, which
    // keeps its own null dup_of; 9 -> 8 where 8 is absent (admitted):
    // 9 keeps 8. Reasons never rewrite.
    val rej = Seq(
      (2L, None, "quality"),
      (3L, Some(2L), "near_batch"),
      (4L, Some(3L), "exact_batch"),
      (9L, Some(8L), "near_corpus")
    ).toDF("doc_id", "dup_of", "reason")
    val out = IngestDedup.resolveChains(rej)
      .collect()
      .map(r => (r.getLong(0),
        (Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
          r.getString(2)))).toMap
    assert(out(2L) === ((None, "quality")))
    assert(out(3L) === ((Some(2L), "near_batch")))
    assert(out(4L) === ((Some(2L), "exact_batch")))
    assert(out(9L) === ((Some(8L), "near_corpus")))
  }

  test("the distributed join loop resolves chains deeper than 256") {
    // Force the pointer-jump join path (driverLimit = 0) on a chain
    // deeper than the old 8-round (2^8-depth) bound; resolved depth
    // doubles per round so ~9 rounds suffice for depth 300.
    val n = 300
    val rej = (1 to n)
      .map(k => (k.toLong, Option((k - 1).toLong), "near_batch"))
      .toDF("doc_id", "dup_of", "reason")
    val out = IngestDedup.resolveChains(rej, driverLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === n)
    assert(out.values.forall(_ == 0L), "every chain member resolves to doc 0")
  }

  test("a cycle (corrupted input) fails loudly instead of spinning") {
    val rej = Seq(
      (1L, Some(2L), "near_batch"),
      (2L, Some(1L), "near_batch")
    ).toDF("doc_id", "dup_of", "reason")
    val e = intercept[IllegalArgumentException] {
      IngestDedup.resolveChains(rej).collect()
    }
    assert(e.getMessage.contains("cycled"))
  }

  test("the distributed join loop also fails loudly on a cycle") {
    // An even-length cycle doesn't spin the pointer-jump loop — one
    // round collapses it to self-pointing rows and convergence
    // passes — so the loop must assert no row resolves to itself.
    // driverLimit = 0 forces the distributed path; include a healthy
    // chain alongside the 2-cycle so the failure is the cycle, not
    // a degenerate frame.
    val rej = Seq(
      (1L, Some(2L), "near_batch"),
      (2L, Some(1L), "near_batch"),
      (5L, Some(4L), "exact_batch")
    ).toDF("doc_id", "dup_of", "reason")
    val e = intercept[IllegalArgumentException] {
      IngestDedup.resolveChains(rej, driverLimit = 0L).collect()
    }
    assert(e.getMessage.contains("cycled"))
  }
}
