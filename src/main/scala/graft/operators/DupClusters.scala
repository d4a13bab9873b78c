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
    // iterative find (walk to root, then compress): recursion here would
    // stack-overflow on adversarially ordered edge lists whose parent
    // chains grow with component size
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
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
    // silent non-convergence would hand the caller SPLIT components with
    // wrong cluster ids — fail loudly instead (near-dup graphs are shallow;
    // hitting this means maxIter is misconfigured for the graph's diameter)
    if (!converged)
      throw new IllegalStateException(
        s"bspHashMin did not converge after $maxIter rounds; raise maxIter " +
          "(components deeper than the round budget would get split labels)")
    labels
  }

  /** Driver-facing query: cluster the MinHash+LSH near-dup pairs; docs in
    * no pair are singletons (cluster_id = own id). Reuses the session-memoized
    * pair list ([[Dedup.minhashPairs]]) so the signature/banding work isn't
    * recomputed when `d3_minhash_lsh` already ran.
    */
  def dupClustersQuery(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.minhashPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val clustered = clusters(spark, pairs)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(broadcast(clustered), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", (col("doc_id") === col("cluster_id")).cast("boolean"))
  }

  /** The driver-gated Q, upgraded from rows-only to hash-exact: connected
    * components IS SQL-expressible in DuckDB via a recursive CTE —
    * transitive closure over the symmetric edge list (set-semantics UNION
    * terminates it), then min reachable id per doc = cluster id.
    */
  /** Shared DuckDB connected-components CTE text over a `pairs(doc_a,
    * doc_b)` CTE: symmetric edges → recursive transitive closure
    * (set-semantics UNION terminates it) → min reachable id per doc.
    * One definition for the three oracles that need cluster labels
    * (d5, d10, c3) — closure-semantics fixes apply in exactly one place.
    */
  private[graft] val ccCtes: String =
    """edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON r.doc_id = e.b),
      |labels AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)""".stripMargin

  /** D10: CANONICAL SELECTION — the step a dedup pipeline runs after
    * clustering: keep exactly one representative per duplicate cluster,
    * chosen by a quality key rather than by arbitrary id. The rule here is
    * the common "longest copy wins": argmax over `(n_chars, −doc_id)` —
    * n_chars descending, doc_id ascending on ties — ALL-integer, so the
    * cross-engine gate is hash-exact with no float-ratio hazard. Both
    * DuckDB side expresses the argmax as a lexicographic struct_pack max
    * (a14's established idiom); the Spark side uses a rank-1 window —
    * ONE shuffle on cluster_id, no second join, and nothing broadcast
    * (a per-cluster canonical table is O(corpus) rows at 100 TB — far too
    * big to broadcast back to the membership).
    */
  def canonicalQuery(spark: SparkSession, dir: String): DataFrame =
    // session-memoized like the d3 pair list: d10 and the c3 funnel both
    // consume this, and the memo is FIXED-WIDTH columns only (doc_id,
    // cluster_id, n_chars, keep — no payload), within the key-set
    // discipline that keeps memos slim at corpus scale
    graft.queries.Memo.cached(spark, dir, "d10_canonical") {
      val labeled = dupClustersQuery(spark, dir).select(col("doc_id"), col("cluster_id"))
      val sized = labeled.join(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      val byQuality = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id"))
      sized
        .withColumn("keep", row_number().over(byQuality) === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("keep"))
    }

  val canonicalQ: graft.queries.Q = graft.queries.Q("d10_canonical_selection",
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |$ccCtes,
       |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |canon AS (SELECT cluster_id,
       |                 -max(struct_pack(n_chars := n_chars, neg_id := -doc_id)).neg_id AS kept_doc
       |          FROM lab GROUP BY cluster_id)
       |SELECT lab.doc_id, lab.cluster_id, lab.n_chars,
       |       lab.doc_id = c.kept_doc AS keep
       |FROM lab JOIN canon c ON lab.cluster_id = c.cluster_id""".stripMargin) {
    (s, dir) => canonicalQuery(s, dir)
  }

  /** D20: CLUSTER-SIZE HISTOGRAM — the duplication-factor curve every
    * dedup report leads with: for each cluster size k, how many clusters,
    * how many docs sit in them, how many are REMOVABLE copies (k−1 per
    * cluster — the exact row count canonical selection would drop), and
    * their total chars (the byte-weighted version of the same story).
    * Singleton rows (size 1, n_removable 0) anchor the curve so the
    * duplicated share reads directly off the table. All-integer.
    *
    * Scale shape: the memoized cluster labels + one doc-key equi-join,
    * then TWO hash aggregates (per-cluster, then per-size — both
    * map-side combinable); the output is |distinct sizes| rows. Nothing
    * beyond the label join touches corpus-sized data twice.
    */
  val clusterHistogramQ: graft.queries.Q = graft.queries.Q("d20_cluster_size_histogram",
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |$ccCtes,
       |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |per_cluster AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz,
       |         CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
       |  FROM lab GROUP BY cluster_id)
       |SELECT sz AS cluster_size,
       |       CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(sum(sz) AS BIGINT) AS n_docs,
       |       CAST(sum(sz - 1) AS BIGINT) AS n_removable,
       |       CAST(sum(chars) AS BIGINT) AS chars_total
       |FROM per_cluster GROUP BY sz""".stripMargin) {
    (s, dir) =>
      val sized = dupClustersQuery(s, dir).select(col("doc_id"), col("cluster_id"))
        .join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          Seq("doc_id"))
      sized.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("sz"), sum(col("n_chars").cast("long")).as("chars"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"),
          sum(col("sz") - 1).as("n_removable"),
          sum(col("chars")).cast("long").as("chars_total"))
  }

  /** D21: SOURCE DEDUP IMPACT — what canonical selection costs each
    * source: per source, docs in vs docs kept (d10's longest-copy-wins
    * keep flag), chars in vs chars kept, and the loss in ppm — the
    * report that feeds mixture REWEIGHTING (a source that loses 40% of
    * its mass to dedup needs its t12/t17 budget weight cut BEFORE
    * sampling, or the post-dedup mix silently drifts from the recipe).
    * All-integer.
    *
    * Scale shape: the session-memoized d10 keep table (fixed-width
    * doc_id/cluster_id/n_chars/keep — no payload) + one doc-key
    * equi-join for the source column + ONE hash aggregate to |sources|
    * rows.
    */
  val sourceDedupImpactQ: graft.queries.Q = graft.queries.Q("d21_source_dedup_impact",
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |$ccCtes,
       |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |               d.n_chars, d.source
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |canon AS (SELECT cluster_id,
       |                 -max(struct_pack(n_chars := n_chars, neg_id := -doc_id)).neg_id AS kept_doc
       |          FROM lab GROUP BY cluster_id)
       |SELECT lab.source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN lab.doc_id = c.kept_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CAST(lab.n_chars AS BIGINT)) AS BIGINT) AS chars_in,
       |       CAST(sum(CASE WHEN lab.doc_id = c.kept_doc THEN CAST(lab.n_chars AS BIGINT) ELSE 0 END) AS BIGINT) AS chars_kept,
       |       CAST(sum(CASE WHEN lab.doc_id = c.kept_doc THEN 0 ELSE CAST(lab.n_chars AS BIGINT) END) * 1000000
       |            // greatest(sum(CAST(lab.n_chars AS BIGINT)), 1) AS BIGINT) AS char_loss_ppm
       |FROM lab JOIN canon c ON lab.cluster_id = c.cluster_id
       |GROUP BY lab.source""".stripMargin) {
    (s, dir) =>
      val kept = canonicalQuery(s, dir) // memoized: doc_id, cluster_id, n_chars, keep
      kept.join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_kept"),
          sum(col("n_chars").cast("long")).cast("long").as("chars_in"),
          sum(when(col("keep"), col("n_chars").cast("long")).otherwise(0L))
            .cast("long").as("chars_kept"),
          expr("""CAST(sum(CASE WHEN keep THEN 0L ELSE CAST(n_chars AS BIGINT) END) * 1000000
                  div greatest(sum(CAST(n_chars AS BIGINT)), 1) AS BIGINT)""")
            .as("char_loss_ppm"))
  }

  val dupClustersQ: graft.queries.Q = graft.queries.Q("d5_dup_clusters",
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |$ccCtes
       |SELECT d.doc_id,
       |       coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |       d.doc_id = coalesce(l.cluster_id, d.doc_id) AS is_canonical
       |FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id""".stripMargin) {
    (s, dir) => dupClustersQuery(s, dir)
  }
}
