package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** Gates for k-core peeling beyond oracle parity: the CASCADE (removing
  * a low-degree vertex can drag its neighbor below k next round), the
  * core invariant (every survivor's degree within the core ≥ k), and
  * that the gated query's peel has SETTLED at this SF (so the emitted
  * set is the true 2-core, not a truncated intermediate).
  */
class KCoreSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def biOf(und: Seq[(Long, Long)]) = {
    val u = und.toDF("u", "v")
    u.select($"u".as("src"), $"v".as("dst"))
      .unionAll(u.select($"v".as("src"), $"u".as("dst")))
  }

  test("peel cascades down a chain hung off a triangle") {
    // triangle 1-2-3 plus chain 3-4-5: 5 peels first (deg 1), then 4 —
    // two rounds needed; the 2-core is exactly the triangle
    val bi = biOf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val core = Similarity.kCorePeel(bi, k = 2, peelRounds = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round is NOT enough (vertex 4 still has degree 2 then) — the
    // cascade is real
    val oneRound = Similarity.kCorePeel(bi, k = 2, peelRounds = 1)
      .select($"vec_id").as[Long].collect().toSet
    assert(oneRound == Set(1L, 2L, 3L, 4L))
  }

  test("gated query: peel settled at this SF (every survivor's core degree >= k)") {
    val r4 = Similarity.kCore.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    // core_degree is the degree WITHIN the round-4 survivor subgraph, so
    // "all >= 2" means round 5 would drop nobody — the fixpoint is
    // reached and the emitted set is the true 2-core, not a truncation
    assert(r4.nonEmpty && r4.values.forall(_ >= 2L),
      s"unsettled peel: ${r4.filter(_._2 < 2L)}")
  }
}
