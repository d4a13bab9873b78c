package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Streaming SemDeDup gates — mirrors StreamingNearDupSpec for the
  * embedding screen: verdicts must equal the batch SemDeDup recompute
  * over everything ingested so far (same frozen centroids), replay
  * converges, the probe stays a cell equi-join, and compaction preserves
  * screening.
  */
class StreamingSemDedupSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // deterministic 8-dim corpus: family f's base vector is one-hot-ish on
  // axis f%8 with a family-unique tail component, so distinct families
  // are near-orthogonal (cos ≈ 0) and near-copies (tiny perturbation on a
  // non-dominant axis) have cos ≈ 0.99 — far on either side of τ=0.9
  private def base(f: Int): Array[Float] = {
    val v = Array.fill(8)(0.0f)
    v(f % 8) = 10.0f
    v((f + 3) % 8) += 1.0f + (f % 5) * 0.1f
    v
  }
  private def nearCopy(f: Int): Array[Float] = {
    val v = base(f)
    v((f + 5) % 8) += 0.3f
    v
  }

  /** (vec_id, family, isCopy) → rows; copies of family f duplicate f's base */
  private def vecs(rows: Seq[(Long, Int, Boolean)]) =
    rows.map { case (id, f, copy) => (id, if (copy) nearCopy(f) else base(f)) }
      .toDF("vec_id", "embedding")

  test("stream screening equals batch SemDeDup recompute under the frozen codebook") {
    val indexDir = tmp("ssd-index") + "/index"
    val tau = 0.9

    // batch 0: six fresh families + one intra-batch near-copy of vec 0
    val b0 = vecs(Seq((0L, 0, false), (1L, 1, false), (2L, 2, false),
      (3L, 3, false), (4L, 4, false), (5L, 5, false), (6L, 0, true)))
    // batch 1: cross-batch near-copy of family 1, two fresh families,
    // an exact re-send of vec 2's family base
    val b1 = vecs(Seq((10L, 1, true), (11L, 6, false), (12L, 7, false),
      (13L, 2, false)))
    // batch 2: copies only
    val b2 = vecs(Seq((20L, 6, true), (21L, 4, true)))

    val v0 = StreamingSemDedup.screenBatch(b0, indexDir, 0L, k = 4, tau = tau)
      .select($"vec_id", $"is_near_dup", $"matched_vec")
      .as[(Long, Boolean, Option[Long])].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(v0(0L) == (false, None) && v0(5L) == (false, None))
    assert(v0(6L)._1 && v0(6L)._2.contains(0L), s"intra-batch near-copy missed: ${v0(6L)}")

    val v1 = StreamingSemDedup.screenBatch(b1, indexDir, 1L, k = 4, tau = tau)
      .select($"vec_id", $"is_near_dup", $"matched_vec")
      .as[(Long, Boolean, Option[Long])].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(v1(10L)._1 && v1(10L)._2.contains(1L), s"cross-batch near-copy missed: ${v1(10L)}")
    assert(v1(11L)._1 == false && v1(12L)._1 == false)
    assert(v1(13L)._1 && v1(13L)._2.contains(2L), s"exact cross-batch dup missed: ${v1(13L)}")

    val v2 = StreamingSemDedup.screenBatch(b2, indexDir, 2L, k = 4, tau = tau)
      .select($"vec_id", $"is_near_dup", $"matched_vec")
      .as[(Long, Boolean, Option[Long])].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(v2(20L)._1 && v2(20L)._2.contains(11L))
    assert(v2(21L)._1 && v2(21L)._2.contains(4L))

    // EQUIVALENCE: streamed is_near_dup must equal batch SemDeDup's
    // NOT-keep over the full corpus, under the SAME (frozen) centroids
    // and the same lower-id-survives rule — arrival order here is vec_id
    // order, so the streaming "earlier" relation coincides with batch's
    val all = b0.unionByName(b1).unionByName(b2)
    val cents = StreamingSemDedup.centroidsFor(spark, indexDir, b0, k = 4, seed = 42L)
    val assigned = StreamingSemDedup.assign(all, cents)
      .select($"vec_id", $"embedding", $"cell_id")
    val batchVerdicts = graft.operators.SemDedup.verdicts(assigned, tau)
      .select($"vec_id", $"keep").as[(Long, Boolean)].collect().toMap
    val streamed = (v0 ++ v1 ++ v2).map { case (k2, (d, _)) => k2 -> d }
    batchVerdicts.foreach { case (id, keep) =>
      assert(streamed(id) == !keep,
        s"vec $id: streamed=${streamed(id)} batch keep=$keep")
    }

    // REPLAY: re-screening the last batch with ITS OWN batchId must not
    // match the batch against its own indexed rows
    val replayed = StreamingSemDedup.screenBatch(b2, indexDir, 2L, k = 4, tau = tau)
      .select($"vec_id", $"is_near_dup", $"matched_vec")
      .as[(Long, Boolean, Option[Long])].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(replayed == v2, s"replay diverged: $replayed vs $v2")

    // PLAN: the probe shape (assigned batch ⋈ history on cell_id) is a
    // hash equi-join — never a cartesian. The assignment itself contains
    // a justified BNLJ (batch × broadcast k-row centroids), so checkpoint
    // the assigned side to isolate the history join under test.
    val probe = StreamingSemDedup.assign(b2, cents).localCheckpoint(true)
      .join(PartitionedIndex.scan(spark, indexDir).get, Seq("cell_id"))
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semdedup probe degenerated to a cartesian:\n$p")
  }

  test("replay after later batches landed must not see the future") {
    val indexDir = tmp("sd-future") + "/index"
    val b0 = vecs(Seq((0L, 0, false), (1L, 1, false), (2L, 2, false)))
    val b1 = vecs(Seq((10L, 0, true)))
    val v0 = StreamingSemDedup.screenBatch(b0, indexDir, 0L, k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v0 == Map(0L -> false, 1L -> false, 2L -> false))
    val v1 = StreamingSemDedup.screenBatch(b1, indexDir, 1L, k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v1 == Map(10L -> true))
    // replaying batch 0 after batch 1 landed must reproduce the original
    // verdicts — vec 0 clean — not flag it against its own future copy
    val replayed = StreamingSemDedup.screenBatch(b0, indexDir, 0L, k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(replayed == v0,
      s"replayed batch 0 saw the future: $replayed (history must be __batch < batchId)")
  }

  test("centroids are frozen at first ingest and reused verbatim") {
    val indexDir = tmp("ssd-frozen") + "/index"
    val b0 = vecs(Seq((0L, 0, false), (1L, 1, false), (2L, 2, false), (3L, 3, false)))
    val c1 = StreamingSemDedup.centroidsFor(spark, indexDir, b0, k = 2, seed = 42L)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    // a DIFFERENT "first" batch afterwards must not retrain
    val other = vecs(Seq((100L, 7, false), (101L, 6, false), (102L, 5, false)))
    val c2 = StreamingSemDedup.centroidsFor(spark, indexDir, other, k = 2, seed = 7L)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    assert(c1 == c2, "centroids must be frozen after first publish")
  }

  test("an empty first trigger defers codebook training to the first non-empty batch") {
    val indexDir = tmp("ssd-empty") + "/index"
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // empty first batch: no verdicts, no training, no index partition
    val v = StreamingSemDedup.screenBatch(empty, indexDir, 0L, k = 4, tau = 0.9)
    assert(v.count() == 0L)
    assert(v.columns.toSeq == Seq("vec_id", "is_near_dup", "matched_vec", "cosine"))
    val (fs, root) = PartitionedIndex.fsFor(spark, indexDir + ".centroids")
    assert(!fs.exists(root), "empty batch must not publish a codebook")
    // the first NON-empty batch trains as if it were first
    val b = vecs(Seq((0L, 0, false), (1L, 1, false), (2L, 0, true)))
    val v1 = StreamingSemDedup.screenBatch(b, indexDir, 1L, k = 2, tau = 0.9)
      .select($"vec_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    assert(!v1(0L) && !v1(1L) && v1(2L))
    // calling centroidsFor directly with an empty batch fails loudly
    val e = intercept[IllegalArgumentException] {
      StreamingSemDedup.centroidsFor(spark, tmp("ssd-empty2") + "/index", empty, 4, 42L)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("soak: heavy-dup embedding batches against a growing index stay bounded") {
    // three 5k-vector batches, 50% exact re-sends of earlier vectors (the
    // re-crawl shape). Families are spread over a 64-cell codebook trained
    // on the first batch, so cells stay ~n/k and the probe cost tracks
    // Σ|cell|² — the wall limit guards that bound, as in the near-dup soak.
    val indexDir = tmp("ssd-soak") + "/index"
    // deterministic pseudo-random direction per id (LCG mix): 15k random
    // 8-dim vectors are pairwise far below τ=0.9999 (the τ-cap around any
    // direction has ~1e-11 mass, ~1e8 pairs → no collisions), while exact
    // copies are bit-identical. Structured families don't work here: any
    // shared dominant component keeps same-family cosines ≈ 1 no matter
    // the bounded perturbation.
    def synth(id: Long): Array[Float] = {
      val v = new Array[Float](8)
      var h = id * 2654435761L + 12345L
      var j = 0
      while (j < 8) {
        h = h * 6364136223846793005L + 1442695040888963407L
        v(j) = (((h >>> 33) % 1001L) - 500L).toFloat / 100.0f
        j += 1
      }
      v
    }
    def batchDf(b: Int) = (0 until 5000).map { i =>
      val id = b * 5000L + i
      // even i: fresh vector; odd i: exact copy of the fresh vector one
      // position earlier (previous batch when b > 0)
      if (i % 2 == 0) (id, synth(id))
      else {
        val srcId = if (b > 0) (b - 1) * 5000L + (i - 1) else id - 1
        (id, synth(srcId))
      }
    }.toDF("vec_id", "embedding")
    val t0 = System.nanoTime()
    val verdicts = (0 until 3).map { b =>
      StreamingSemDedup.screenBatch(batchDf(b), indexDir, b.toLong, k = 64, tau = 0.9999)
        .select($"vec_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(wallSec < 120.0, f"embedding screen soak took $wallSec%.0f s — probe not bounded")
    // every exact copy flagged; batch-0 fresh vectors clean
    verdicts.zipWithIndex.foreach { case (v, b) =>
      val odd = v.filter(_._1 % 2 == 1)
      assert(odd.values.forall(identity), s"batch $b missed exact copies")
      if (b == 0) assert(v.filter(_._1 % 2 == 0).values.forall(!_),
        s"batch 0 fresh vectors falsely flagged")
    }
  }

  test("compaction folds the vector index and screening continues identically") {
    val indexDir = tmp("ssd-compact") + "/index"
    val tau = 0.9
    // four batches of fresh families, then a batch of near-copies
    (0 until 4).foreach { b =>
      val rows = (0 until 2).map(i => ((b * 10 + i).toLong, b * 2 + i, false))
      StreamingSemDedup.screenBatch(vecs(rows), indexDir, b.toLong, k = 4, tau = tau).count()
    }
    val before = PartitionedIndex.scan(spark, indexDir).get
      .select($"vec_id", $"cell_id").collect().toSet

    val (folded, _, _) = StreamingSemDedup.compactIndex(spark, indexDir, 4L)
    assert(folded == 4)
    assert(PartitionedIndex.scan(spark, indexDir).get
      .select($"vec_id", $"cell_id").collect().toSet == before,
      "fold must preserve every index row")

    // a near-copy of a folded vector is still caught
    val v = StreamingSemDedup.screenBatch(
      vecs(Seq((100L, 3, true))), indexDir, 4L, k = 4, tau = tau)
      .select($"vec_id", $"is_near_dup", $"matched_vec")
      .as[(Long, Boolean, Option[Long])].collect().head
    assert(v._2 && v._3.nonEmpty, s"post-fold screen missed a known near-copy: $v")
  }
}
