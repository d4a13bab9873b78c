package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** IVF×PQ composition gates (e9): the plan-side result must equal a
  * driver-side recomputation from the same two indexes, and the
  * composition must clear a measured recall floor against exact brute
  * force (it searches nprobe/k of the corpus through 32×-compressed
  * codes, so it is strictly weaker than e7's full-corpus ADC — the floor
  * is correspondingly lower).
  */
class IvfPqSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private val nProbes = 16

  private def exactTop1(): Map[Long, Long] = {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    (0L until nProbes).map { q =>
      val qv = vecs(q)
      val best = vecs.iterator.filter(_._1 != q).minBy { case (id, v) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
        (d, id)
      }
      q -> best._1
    }.toMap
  }

  test("e9 equals a driver-side recomputation from the same indexes") {
    val got = IvfPq.query(spark, sfDir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // recompute: probe cells from the quantized IVF index, ADC over the
    // PQ codes of those cells only, shortlist 32 (the default), exact
    // L2 re-rank
    val ivf = IvfIndex.indexQFor(spark, sfDir)
    val pq = PqIndex.indexFor(spark, sfDir)
    val cells = ivf.assigned.select($"vec_id", $"cell_id")
      .as[(Long, Int)].collect().toMap
    val codes = pq.encoded.select($"vec_id", $"codes")
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def quant(v: Array[Float]): Array[Long] =
      v.map(f => math.floor(f.toDouble * 1048576.0).toLong + 1048576L)
    val cents = ivf.centroids.select($"cell_id", $"cq")
      .as[(Int, Seq[Long])].collect().toMap
    val dsub = 8

    val probes = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" < nProbes)
      .select($"vec_id").as[Long].collect()
    for (q <- probes) {
      val pqv = quant(vecs(q))
      val probeCells = cents.toSeq.map { case (c, cq) =>
        val d2 = pqv.zip(cq).map { case (a, b) => val t = a - b; t * t }.sum
        (d2, c)
      }.sorted.take(4).map(_._2).toSet
      val dt = Array.tabulate(PqIndex.m, PqIndex.k) { (j, kk) =>
        (0 until dsub).map { i =>
          val t = pqv(j * dsub + i) - pq.codebook(j)(kk)(i); t * t
        }.sum
      }
      val shortlist = cells.iterator
        .filter { case (id, c) => id != q && probeCells(c) }
        .map { case (id, _) =>
          (id, (0 until PqIndex.m).map(j => dt(j)(codes(id)(j))).sum) }
        .toSeq.sortBy { case (id, d) => (d, id) }.take(32).map(_._1)
      val qv = vecs(q)
      val best = shortlist.map { id =>
        val v = vecs(id)
        var d = 0.0; var i = 0
        while (i < v.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
        (d, id)
      }.min._2
      assert(got(q) == best, s"probe $q: plan-side e9 disagrees with recomputation")
    }
  }

  test("e9 recall@1 clears the measured floor") {
    val truth = exactTop1()
    val got = IvfPq.query(spark, sfDir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = truth.count { case (q, nn) => got.get(q).contains(nn) }.toDouble / nProbes
    info(f"IVF×PQ recall@1 over $nProbes probes: $recall%.2f")
    // floor matches the r5 defaults (8-bit codebooks, shortlist 32):
    // measured 0.69+ on this deterministic corpus, was 0.50 at the r4
    // 4-bit/shortlist-16 defaults
    assert(recall >= 0.60, f"recall@1 $recall%.2f below pinned floor 0.60")
  }

  test("e10 residual variant: deterministic and clears the recall floor") {
    val truth = exactTop1()
    val run1 = IvfPqResidual.query(spark, sfDir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val run2 = IvfPqResidual.query(spark, sfDir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run1 == run2, "residual IVFPQ must be deterministic")
    val recall = truth.count { case (q, nn) => run1.get(q).contains(nn) }.toDouble / nProbes
    info(f"residual IVF×PQ recall@1 over $nProbes probes: $recall%.2f")
    assert(recall >= 0.60, f"recall@1 $recall%.2f below pinned floor 0.60")
  }
}
