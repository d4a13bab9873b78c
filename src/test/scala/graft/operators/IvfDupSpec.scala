package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** Correctness gates for the non-oracle operators: IVF ANN must equal
  * brute force at nprobe=k; dup clustering must equal a driver-side
  * union-find.
  */
class IvfDupSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("IVF with nprobe=k is EXACTLY brute-force top-1") {
    val vectors = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.build(spark, vectors, k = 8)
    val probes = vectors.filter($"vec_id" < 16)
    val full = IvfIndex.query(spark, ivf, probes, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap

    // independent brute force (driver-side, double math)
    val all = vectors.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = all.filter(_._1 < 16).map { case (q, qe) =>
      q -> all.filter(_._1 != q).map(v => (cos(qe, v._2), -v._1)).max._2 * -1
    }.toMap
    assert(full == expected)
  }

  test("IVF recall@1 at nprobe=k/2 stays useful (the recall/latency trade)") {
    val vectors = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.build(spark, vectors, k = 8)
    val probes = vectors.filter($"vec_id" < 64)
    val exact = IvfIndex.query(spark, ivf, probes, nprobe = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val approx = IvfIndex.query(spark, ivf, probes, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val hits = exact.count { case (q, n) => approx.get(q).contains(n) }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.6, f"recall@1 with half the cells fell to $recall%.2f")
  }

  test("IVF assignment: every vector lands in its nearest cell, cells partition the corpus") {
    val vectors = Tables.embeddings(spark, sfDir)
    val ivf = IvfIndex.build(spark, vectors, k = 8)
    assert(ivf.assigned.count() == vectors.count())
    assert(ivf.assigned.select("vec_id").distinct.count() == vectors.count())
    assert(ivf.centroids.count() == 8)
    // deterministic: same seed → same assignment
    val again = IvfIndex.build(spark, vectors, k = 8)
    assert(ivf.assigned.select("vec_id", "cell_id").collect().toSet ==
      again.assigned.select("vec_id", "cell_id").collect().toSet)
  }

  test("dup clusters equal driver-side union-find on the same pairs") {
    val pairs = graft.queries.Dedup.minhashLsh.run(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    // threshold 0 forces the DISTRIBUTED BSP path; the reference model
    // below is an independent union-find
    val got = DupClusters.clusters(spark,
      pairs.toSeq.toDF("doc_a", "doc_b"), driverEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap

    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => d -> find(d)).toMap
    assert(got == expected)
  }

  test("dupClustersQuery covers every doc; canonical iff own cluster") {
    val out = DupClusters.dupClustersQuery(spark, sfDir)
    assert(out.count() == Tables.documents(spark, sfDir).count())
    assert(out.filter($"is_canonical" =!= ($"doc_id" === $"cluster_id")).count() == 0)
    assert(out.filter($"cluster_id" > $"doc_id").count() == 0) // min-label
  }

  test("d10 canonical selection: exactly one keeper per cluster, longest copy wins") {
    val out = DupClusters.canonicalQuery(spark, sfDir).cache()
    // total coverage and one keep per cluster
    assert(out.count() == Tables.documents(spark, sfDir).count())
    val perCluster = out.groupBy($"cluster_id")
      .agg(org.apache.spark.sql.functions.sum($"keep".cast("int")).as("n_keep"),
        org.apache.spark.sql.functions.max($"n_chars").as("max_chars"))
    assert(perCluster.filter($"n_keep" =!= 1).count() == 0, "each cluster keeps exactly one doc")
    // the keeper carries the cluster's max n_chars, and among equal-length
    // candidates it is the smallest doc_id
    val keepers = out.filter($"keep").join(perCluster, "cluster_id")
    assert(keepers.filter($"n_chars" =!= $"max_chars").count() == 0, "keeper must be longest")
    val tieBreak = out.join(keepers.select($"cluster_id",
        $"doc_id".as("kept"), $"n_chars".as("kept_chars")), "cluster_id")
      .filter($"n_chars" === $"kept_chars" && $"doc_id" < $"kept")
    assert(tieBreak.count() == 0, "equal-length ties must resolve to min doc_id")
    out.unpersist()
  }
}
