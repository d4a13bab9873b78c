package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** Exactness gates for e8 SemDeDup (no SQL oracle — k-means clustering is
  * not SQL-expressible): the removed set must equal an independent
  * driver-side recompute of the documented rule ("a vector is removed iff
  * a lower-id vector in its cell has cosine ≥ τ"), plus the structural
  * invariants that hold for ANY clustering.
  */
class SemDedupSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private val tau = 0.40

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("removed set == brute-force in-cell lower-id similar neighbor") {
    val out = SemDedup.run(spark, sfDir, k = 8, tau = tau).collect()
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val removed = out.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet

    val all = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val emb = all.toMap
    val expected = all.map(_._1).filter { x =>
      all.exists { case (y, ye) =>
        y < x && cellOf(y) == cellOf(x) && cos(emb(x), ye) >= tau
      }
    }.toSet

    assert(removed.nonEmpty, "test corpus should contain semantic near-dups")
    assert(removed == expected,
      s"onlySpark=${removed -- expected} onlyBrute=${expected -- removed}")
  }

  test("one verdict row per corpus vector") {
    val out = SemDedup.run(spark, sfDir, k = 8, tau = tau)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.count() == n)
    assert(out.select($"vec_id").distinct().count() == n)
  }

  test("tau above 1 keeps everything (cosine is bounded)") {
    val out = SemDedup.run(spark, sfDir, k = 8, tau = 1.01)
    assert(out.filter(!$"keep").count() == 0)
  }

  test("the min-id vector of every cell always survives") {
    val out = SemDedup.run(spark, sfDir, k = 8, tau = tau)
    val minPerCell = out.groupBy($"cell_id").agg(min($"vec_id").as("vec_id"))
    val dropped = out.filter(!$"keep")
      .join(minPerCell, Seq("cell_id", "vec_id"))
    assert(dropped.count() == 0)
  }

  test("pair step is an equi-join on the cell (no cartesian)") {
    // hand-built assignment: the plan assert must see the dedup pass
    // alone, not the cached IVF build (whose k-row centroid cross-join
    // is intentional)
    val assigned = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", ($"vec_id" % 8).cast("int").as("cell_id"))
    val p = SemDedup.verdicts(assigned, tau).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("zero-norm vectors never trigger removals (NaN cosine guard)") {
    val assigned = Seq(
      (1L, Array(0.0f, 0.0f), 0), // zero vector, lowest id in cell
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f), 0)  // zero vs zero is also 0/0
    ).toDF("vec_id", "embedding", "cell_id")
    val out = SemDedup.verdicts(assigned, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("the rule itself on a hand-built assignment: removal needs a lower-id in-cell neighbor") {
    // two identical vectors in the same cell → higher id removed; an
    // identical vector in ANOTHER cell survives (cluster-restricted scope)
    val assigned = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 1),
      (4L, Array(0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "cell_id")
    val out = SemDedup.verdicts(assigned, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }
}
