package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.FloatVecDot

/** IVF (inverted-file) approximate nearest neighbor over the embeddings
  * table — the production-scale complement to the sign-bucket LSH in
  * `graft.queries.Similarity`:
  *
  *  1. TRAIN: seeded k-means (MLlib, distributed) over a sample → k cell
  *     centroids (tiny; broadcastable).
  *  2. ASSIGN: each vector joins the broadcast centroid table, keeps its
  *     nearest cell (`min_by` over exact L2) — one narrow pass; the
  *     assignment is the partition key of the stored index.
  *  3. QUERY: a probe ranks centroids, takes its `nprobe` nearest cells,
  *     and searches ONLY those cells with exact cosine rerank.
  *
  * Scale notes (10⁹–10¹² vectors): the corpus never self-joins — every
  * join is vectors × centroids (k rows, broadcast) or probes × cell
  * contents (1/k of the corpus per probe cell). `nprobe = k` degrades to
  * exact brute force (tested as the correctness gate); recall/latency is
  * tuned by (k, nprobe) exactly as in FAISS-style IVF-Flat.
  */
object IvfIndex {

  final case class Ivf(centroids: DataFrame, assigned: DataFrame)

  private def l2sq(a: Column, b: Column): Column = {
    // |a|² − 2a·b + |b|² with the native dot — avoids a zip_with per pair
    call_function("vec_dot", a, a) - lit(2.0) * call_function("vec_dot", a, b) +
      call_function("vec_dot", b, b)
  }

  /** Train the cell centroids (seeded → deterministic) and assign every
    * vector to its nearest cell.
    */
  def build(spark: SparkSession, vectors: DataFrame, k: Int = 16, seed: Long = 42L,
      maxIter: Int = 8): Ivf = {
    FloatVecDot.register(spark)
    val ds = vectors.withColumn("features", array_to_vector(col("embedding")))
    // few Lloyd iterations suffice: IVF needs a *partitioning*, not optimal
    // centroids — recall is governed by nprobe, and the nprobe=k exactness
    // gate (IvfDupSpec) holds for ANY centroid set
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").fit(ds)
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat))
      }.toIndexedSeq).toDF("cell_id", "centroid")

    val joined = vectors
      .join(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("label"), col("cell_id"),
        l2sq(col("embedding"), col("centroid")).as("d2"))
    val assigned = joined
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("cell_id"), col("d2")).as("cell_id"),
        first(col("embedding")).as("embedding"),
        first(col("label")).as("label"))
    Ivf(centroids, assigned)
  }

  /** Top-1 neighbor per probe, searching the probe's `nprobe` nearest
    * cells. `nprobe == k` is exact brute force.
    */
  def query(spark: SparkSession, ivf: Ivf, probes: DataFrame, nprobe: Int): DataFrame = {
    FloatVecDot.register(spark)
    val probeCells = probes
      .join(broadcast(ivf.centroids))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cell_id"), l2sq(col("embedding"), col("centroid")).as("d2"))
      .withColumn("cell_rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(col("d2"), col("cell_id"))))
      .filter(col("cell_rank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell_id"))

    val qNorm = sqrt(call_function("vec_dot", col("q_emb"), col("q_emb")))
    val cNorm = sqrt(call_function("vec_dot", col("embedding"), col("embedding")))
    val sims = probeCells
      .join(ivf.assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"),
        col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
        (call_function("vec_dot", col("q_emb"), col("embedding")) / (qNorm * cNorm)).as("cosine"))
    sims
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))))
      .filter(col("rank") === 1)
      .drop("rank")
  }

  private val indexMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String, Int), Ivf]()

  /** Build-once index per (session, dir, dir-fingerprint, k): train +
    * assign happen the first time, then persist — queries against the
    * index never re-train. This is the real IVF lifecycle (index build is
    * offline; probes are online) and it takes k-means off the per-query
    * critical path. `k` is part of the key: indexes with different cell
    * counts are different indexes. The fingerprint (see
    * [[graft.queries.Memo.fingerprint]]) retires the index when the data
    * under `dir` is rewritten mid-session.
    */
  def indexFor(spark: SparkSession, dir: String, k: Int = 16): Ivf = {
    val fp = graft.queries.Memo.fingerprint(spark, dir)
    // retire (unpersist) superseded fingerprints, don't just orphan them —
    // for EVERY k of this (session, dir): a rewrite invalidates all
    // indexes over the old data, not just the k being requested now
    val it = indexMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (es, ed, efp, _) = e.getKey
      if ((es eq spark) && ed == dir && efp != fp) {
        e.getValue.centroids.unpersist()
        e.getValue.assigned.unpersist()
        it.remove()
      }
    }
    indexMemo.computeIfAbsent((spark, dir, fp, k), { _ =>
      val ivf = build(spark, Tables.embeddings(spark, dir), k)
      Ivf(ivf.centroids.persist(), ivf.assigned.persist())
    })
  }

  /** Unpersist and drop a session's cached indexes (mirror of
    * [[graft.queries.Memo.clear]]).
    */
  def clearIndexes(spark: SparkSession): Unit = {
    val it = indexMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        e.getValue.centroids.unpersist()
        e.getValue.assigned.unpersist()
        it.remove()
      }
    }
  }

  /** Driver-facing query: 16 probes with nprobe=4 against the persisted
    * k=16 index. KMeans is not SQL-expressible → rows-only check.
    */
  def ivfQuery(spark: SparkSession, dir: String): DataFrame = {
    val ivf = indexFor(spark, dir)
    query(spark, ivf, Tables.embeddings(spark, dir).filter(col("vec_id") < 16), nprobe = 4)
  }
}
