package graft.batch

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: the shuffle-amortization path for repeated
  * large⋈large joins.
  *
  * The reference re-joins `production_records ⋈ part_numbers ⋈
  * work_centers` on every per-key query (Prensas.py:292-293, 326,
  * 369-374); at 100 TB the equivalent is a fact table joined on the same
  * key by many queries per day. Bucketing pays the shuffle ONCE at write
  * time: both sides hash-clustered and sorted into N files per key
  * hash, so every subsequent equi-join or aggregation on that key plans
  * as a zero-exchange sort-merge join over co-located buckets
  * (BucketingSpec asserts the plan). N should be sized so one bucket of
  * the big table fits an executor core's memory — e.g. 4096 buckets for
  * a 10 TB table ≈ 2.5 GB/bucket.
  */
object Bucketing {
  /** Persist `df` hash-bucketed + sorted by `key` into the session
    * catalog as `name` (parquet; overwrite).
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(name)
}
