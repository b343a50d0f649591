package graft.batch

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persistent IVF (inverted-file) vector index: build once, search
  * many — the production ANN shape where the index amortizes over
  * query batches, unlike [[Similarity.qs3_ivf_ann]] which quantizes
  * per query run.
  *
  * Layout under `dir`:
  *   - `centroids/` — (cid, ce, cn): the coarse quantizer, tiny
  *     (≤ thousands of rows), broadcast at search time;
  *   - `cells/` — the corpus with norms, hive-PARTITIONED BY cell, so
  *     a probe of p cells opens p directories and the rest of the
  *     corpus is never read (same PartitionFilters machinery LakeSpec
  *     pins for dates; IvfIndexSpec pins it for cells).
  *
  * At 100 TB: centroid selection and assignment are one broadcast
  * map-side pass over the corpus plus one partitioned write; search
  * shuffles only (qid, id, score) triples, pre-reduced to ≤ k per
  * partition per query by the native GroupTopK.
  */
object IvfIndex {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.vec_dot(a, b)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(graft.functions.GraftFunctions.vec_dot(col("embedding"), col("embedding"))))

  /** Build the index from an (vec_id, embedding) frame. Centroids are
    * a deterministic md5-ranked sample of `nCells` corpus vectors
    * (content-addressed like q36's sampler: rebuilds pick the same
    * centroids, so incremental re-indexing is stable). */
  def build(emb: DataFrame, dir: String, nCells: Int): Unit = {
    val nm = withNorm(emb)
    // global orderBy + limit plans as TakeOrderedAndProject: each corpus
    // partition keeps only its nCells best rows in a bounded heap and a
    // single tiny merge picks the winners — the exact distributed top-k,
    // in ONE corpus job (the previous hash-admission cut needed two
    // corpus-wide count() actions first). nCells stays ≤ a few thousand
    // by design (the quantizer must broadcast); beyond
    // spark.sql.execution.topKSortFallbackThreshold Spark would fall
    // back to a full sort — raise that conf before raising nCells.
    val cents = nm
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")

    val centsB = broadcast(cents)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("crcos").desc, col("cid").asc)
    nm.crossJoin(centsB)
      .withColumn("crcos", round(dot(col("ce"), col("embedding")) / (col("cn") * col("nrm")), 6))
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Incremental maintenance: assign a NEW batch of (vec_id, embedding)
    * rows to the existing centroids and append into the cell layout —
    * what a streaming corpus does per micro-batch (call from
    * `foreachBatch`, like [[graft.stream.IngestDedup]]'s index).
    * Centroids stay fixed between rebuilds, so appends are one
    * broadcast map-side pass + a partitioned append; searchers see new
    * vectors immediately and drift is handled by periodic [[build]]
    * (content-addressed centroids make rebuilds reproducible). */
  def appendBatch(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    val cents = broadcast(spark.read.parquet(s"$dir/centroids"))
    val nm = withNorm(batch)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("crcos").desc, col("cid").asc)
    nm.crossJoin(cents)
      .withColumn("crcos", round(dot(col("ce"), col("embedding")) / (col("cn") * col("nrm")), 6))
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(s"$dir/cells")
  }

  /** Top-k cosine neighbors for each (vec_id, embedding) query row,
    * probing the `nProbe` nearest cells. Probing ALL cells is exact
    * brute force (IvfIndexSpec asserts equality with knnTopK); small
    * `nProbe` trades recall for opening only that many cell
    * directories. Output: (qid, rank, neighbor_id, rcos). */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nProbe: Int): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$dir/centroids"))
    val cells = spark.read.parquet(s"$dir/cells")
    val q = withNorm(queries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy("qid").orderBy(col("crcos").desc, col("cid").asc)
    val probes = q.crossJoin(cents)
      .withColumn("crcos", round(dot(col("ce"), col("qe")) / (col("cn") * col("qn")), 6))
      .withColumn("rn", row_number().over(wProbe)).filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cid").as("cell"))
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rcos", round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6))
    graft.plans.GroupTopK.topK(
      cand.select(col("qid").cast("long"), col("vec_id").cast("long"), col("rcos").cast("double")),
      keys = Seq("qid"), order = Seq(col("rcos").desc, col("vec_id").asc), k = k)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor_id"), col("rcos"))
  }
}
