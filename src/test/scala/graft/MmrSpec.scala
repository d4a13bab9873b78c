package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** e15 MMR selection properties (the oracle gate pins the exact rows;
  * this pins the semantics that make it MMR and not plain top-k).
  */
class MmrSpec extends AnyFunSuite with SparkTestKit {

  private lazy val sel =
    Similarity.mmrDiversify.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    def d(x: Array[Float], y: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < x.length) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
      acc
    }
    d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
  }

  private lazy val embOf: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id").isin(sel.map(_._2) :+ 0L: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("five distinct picks, steps 1..5, first pick is argmax relevance") {
    assert(sel.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    assert(sel.map(_._2).distinct.length == 5)
    // step 1 has the globally maximal rel of the selection and its score
    // is exactly 0.7·rel (empty selected set ⇒ maxsim term is 0)
    val first = sel.head
    assert(sel.forall(_._3 <= first._3))
    assert(first._4 == 0.7 * first._3)
  }

  test("MMR scores are non-increasing across steps (greedy argmax invariant)") {
    // each later pick maximized a score the earlier pick also competed
    // for with one FEWER redundancy term — so step scores can only fall
    sel.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4 + 1e-12, s"step ${b._1} score rose: ${a._4} -> ${b._4}")
    }
  }

  test("selection is less redundant than plain top-5-by-relevance") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val probe = e.where($"vec_id" === 0).select($"embedding").head.getSeq[Float](0).toArray
    val byRel = e.where($"vec_id" =!= 0)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy { case (id, emb) => (-cosine(emb, probe), id) }
      .take(5)
    def meanPairSim(xs: Array[(Long, Array[Float])]): Double = {
      val ps = for (i <- xs.indices; j <- xs.indices if i < j)
        yield cosine(xs(i)._2, xs(j)._2)
      ps.sum / ps.size
    }
    val mmrSet = sel.map(t => (t._2, embOf(t._2)))
    assert(meanPairSim(mmrSet) <= meanPairSim(byRel) + 1e-12,
      "MMR must not be MORE redundant than pure relevance ranking")
  }
}
