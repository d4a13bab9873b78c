package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.Dedup

/** Near-duplicate clustering: connected components over a pair list
  * (e.g. the MinHash+LSH candidates) — each doc converges to the smallest
  * doc_id reachable from it, which becomes the cluster id (the canonical
  * survivor a dedup pass keeps).
  *
  * Adaptive execution, sized by the EDGE list, not the corpus: verified
  * near-dup pairs are orders of magnitude smaller than the document set
  * (measured: 253 pairs from 5,000 docs at sf0.1), so
  *
  *  - below `driverEdgeThreshold` edges: collect + union-find on the
  *    driver (microseconds; a distributed BSP loop would pay seconds of
  *    scheduling per round for nothing);
  *  - above it: Hash-Min BSP — one edge self-join + aggregate per round,
  *    rounds ≈ graph diameter (near-dup graphs are cliquey and shallow).
  *    Each round persists its labels so lineage stays flat.
  *
  * The threshold default (10M edges ≈ 160 MB of longs) is far below any
  * driver-memory risk; at 100 TB with billions of candidate pairs the BSP
  * path engages automatically.
  */
object DupClusters {

  /** @param pairs two LongType columns (doc_a, doc_b), undirected edges.
    * @return (doc_id, cluster_id) for every doc appearing in `pairs`.
    */
  def clusters(spark: SparkSession, pairs: DataFrame,
      maxIter: Int = 20, driverEdgeThreshold: Long = 10_000_000L): DataFrame = {
    val edges = pairs.select(col("doc_a"), col("doc_b")).persist()
    val n = edges.count()
    val out = if (n <= driverEdgeThreshold) driverUnionFind(spark, edges)
              else bspHashMin(edges, maxIter)
    edges.unpersist()
    out
  }

  private def driverUnionFind(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val keys = parent.keySet ++ parent.values
    keys.toSeq.map(d => (d, find(d))).toDF("doc_id", "cluster_id")
  }

  private def bspHashMin(pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("neighbor_min"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id"))).as("cluster_id"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "prev"), Seq("doc_id"))
        .filter(col("cluster_id") =!= col("prev")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Driver-facing query: cluster the MinHash+LSH near-dup pairs; docs in
    * no pair are singletons (cluster_id = own id). Iterative — not
    * SQL-expressible in one statement → rows-only check.
    */
  def dupClustersQuery(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashLsh.run(spark, dir).select(col("doc_a"), col("doc_b"))
    val clustered = clusters(spark, pairs)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(broadcast(clustered), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", (col("doc_id") === col("cluster_id")).cast("boolean"))
  }
}
