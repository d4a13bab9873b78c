package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** Semantic gates for e22 beyond oracle parity: the defining BFS
  * invariants over the ACTUAL kNN edge list — seeds at 0, the 1-Lipschitz
  * property along every edge, and the hop bound.
  */
class GraphBfsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val hops = Similarity.bfsHops.run(spark, sfDir).cache()

  test("every seed is at distance 0 and every emitted hop is within the round bound") {
    assert(hops.filter($"vec_id" % 50 === 0 && $"n_hops" =!= 0).count() == 0)
    assert(hops.filter($"n_hops" < 0 || $"n_hops" > 4).count() == 0)
  }

  test("BFS distances are 1-Lipschitz along every edge (|d(u) - d(v)| <= 1 when both are final)") {
    // rebuild the same undirected edge list e22 traverses
    val e = Similarity.knnGraph.run(spark, sfDir)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val und = e.select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
    val du = hops.select($"vec_id".as("u"), $"n_hops".as("hu"))
    val dv = hops.select($"vec_id".as("v"), $"n_hops".as("hv"))
    // only edges whose BOTH endpoints settled within the 4-round horizon
    // are constrained: a frontier vertex at hops=4 may have unreached
    // neighbors, and that is correct for a bounded traversal
    val joined = und.join(du, "u").join(dv, "v")
    val violations = joined.filter(
      abs($"hu" - $"hv") > 1 && $"hu" < 4 && $"hv" < 4)
    assert(violations.count() == 0,
      s"non-Lipschitz edge(s): ${violations.limit(5).collect().mkString(", ")}")
  }

  test("hop levels are contiguous from 0 up to the observed maximum") {
    val levels = hops.select($"n_hops").distinct().as[Long].collect().sorted
    assert(levels.head == 0)
    assert(levels.zipWithIndex.forall { case (l, i) => l == i },
      s"gap in hop levels: ${levels.mkString(",")}")
  }
}
