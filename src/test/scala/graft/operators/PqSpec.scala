package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** PQ ANN gates (no SQL oracle — k-means): determinism, code-space
  * sanity, quantization-error contraction versus an untrained codebook,
  * and measured recall@1 against exact L2 brute force.
  */
class PqSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val pq = PqIndex.indexFor(spark, sfDir)

  private def exactTop1(nProbes: Int): Map[Long, Long] = {
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

  test("encoding is deterministic and codes stay in [0, k)") {
    val a = pq.encoded.select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PqIndex.build(spark, graft.Tables.embeddings(spark, sfDir))
      .encoded.select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "re-building the index must reproduce identical codes")
    assert(a.values.forall(cs => cs.length == PqIndex.m
      && cs.forall(c => c >= 0 && c < PqIndex.k)))
  }

  test("trained codebook contracts quantization error vs an untrained one") {
    // untrained = the Lloyd INIT (evenly spaced sample points, 0 iters):
    // training must strictly reduce summed subspace quantization error.
    // One collect serves the error evaluation and the init construction.
    // Everything lives in the quantized integer domain the trainer uses.
    val sample = graft.Tables.embeddings(spark, sfDir)
      .select($"embedding").orderBy($"vec_id").collect()
      .map(_.getSeq[Float](0).toArray
        .map(f => math.floor(f.toDouble * 1048576.0).toLong + 1048576L))
    def qErr(codebook: IndexedSeq[IndexedSeq[IndexedSeq[Long]]]): Double = {
      val dsub = sample.head.length / PqIndex.m
      sample.map { v =>
        (0 until PqIndex.m).map { j =>
          codebook(j).map { c =>
            (0 until dsub).map { i =>
              val t = (v(j * dsub + i) - c(i)).toDouble; t * t
            }.sum
          }.min
        }.sum
      }.sum
    }
    val n = sample.length
    val dsub = sample.head.length / PqIndex.m
    val untrained: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
      IndexedSeq.tabulate(PqIndex.m) { j =>
        IndexedSeq.tabulate(PqIndex.k) { i =>
          sample(((i.toLong * n) / PqIndex.k).toInt)
            .slice(j * dsub, (j + 1) * dsub).toIndexedSeq
        }
      }
    val trained = qErr(pq.codebook)
    val init = qErr(untrained)
    assert(trained < init * 0.8,
      f"training should cut quantization error meaningfully: $trained%.1f vs init $init%.1f")
  }

  test("ADC search matches a driver-side recomputation (same codes, same tables)") {
    val probes = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" < 8)
    val got = PqIndex.query(spark, pq, probes, topk = 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute ADC on the driver from the same codebook + codes
    val codes = pq.encoded.select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qvecs = probes.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray
        .map(f => math.floor(f.toDouble * 1048576.0).toLong + 1048576L)).toMap
    val dsub = qvecs.values.head.length / PqIndex.m
    for ((q, qv) <- qvecs) {
      val dt = Array.tabulate(PqIndex.m, PqIndex.k) { (j, kk) =>
        (0 until dsub).map { i =>
          val t = qv(j * dsub + i) - pq.codebook(j)(kk)(i); t * t
        }.sum
      }
      val best = codes.iterator.filter(_._1 != q).minBy { case (id, cs) =>
        ((0 until PqIndex.m).map(j => dt(j)(cs(j))).sum, id)
      }
      assert(got(q) == best._1, s"probe $q: plan-side ADC disagrees with recomputation")
    }
  }

  test("recall@1 vs exact L2 brute force clears the measured floor") {
    val nProbes = 16
    val truth = exactTop1(nProbes)
    val got = PqIndex.pqQuery(spark, sfDir)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = truth.count { case (q, nn) => got.get(q).contains(nn) }
    val recall = hits.toDouble / nProbes
    info(f"PQ recall@1 over $nProbes probes: $recall%.2f")
    assert(recall >= 0.30, f"recall@1 $recall%.2f below pinned floor 0.30")
  }
}
