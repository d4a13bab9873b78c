package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** e13 vs e13b (VERDICT r7 item 7): the redistribution variant must
  * conserve the quantized rank mass (up to integer-truncation loss),
  * while the no-redistribution variant leaks the dangling fraction each
  * iteration. Also pins that on a graph with NO dangling nodes the knob
  * cannot change rank totals by more than the extra `div N` truncation.
  */
class PagerankMassSpec extends AnyFunSuite with SparkTestKit {

  private val Q = 1073741824L // 2^30, the quantized total rank mass

  private def total(redistribute: Boolean): Long =
    Similarity.pagerankQuery(spark, sfDir, redistribute)
      .agg(sum(col("pr_q"))).head.getLong(0)

  test("e13b conserves rank mass to integer-truncation loss; e13 <= e13b <= Q") {
    val n = Tables.embeddings(spark, sfDir).count()
    val without = total(redistribute = false)
    val withRedist = total(redistribute = true)
    assert(without <= withRedist, "redistribution can only add mass")
    assert(withRedist <= Q, "integer truncation only ever loses mass")
    // loss bound per iteration: ≤1 per node from pr0's Q div N, ≤(deg−1)≤2
    // per node from per-edge division, ≤99 per node from each of the two
    // div-100 sites, ≤1 per node from dm div N → < 250·N per iteration
    val bound = 3 * 250L * n
    assert(Q - withRedist < bound,
      s"e13b lost ${Q - withRedist} of $Q mass — exceeds truncation bound $bound (n=$n)")
  }

  test("dangling mass is the only difference: deltas appear only with dangling nodes") {
    import spark.implicits._
    val a = Similarity.pagerankQuery(spark, sfDir, redistribute = false)
      .select($"vec_id", $"pr_q".as("a"))
    val b = Similarity.pagerankQuery(spark, sfDir, redistribute = true)
      .select($"vec_id", $"pr_q".as("b"))
    val joined = a.join(b, "vec_id")
    // every node's rank weakly increases under redistribution (uniform
    // non-negative addition into every inflow before damping)
    assert(joined.where($"b" < $"a").count() == 0)
  }
}
