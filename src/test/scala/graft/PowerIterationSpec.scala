package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Similarity

/** Semantic gates for e23 beyond oracle parity: the iterates behave like
  * power iteration (direction converges), and the integer-normalization
  * contract holds (nonnegative components, argmax pinned at 2047 by the
  * u·2048 div (max+1) rule).
  */
class PowerIterationSpec extends AnyFunSuite with SparkTestKit {

  private def cosine(a: IndexedSeq[BigInt], b: IndexedSeq[BigInt]): Double = {
    def d(x: IndexedSeq[BigInt], y: IndexedSeq[BigInt]) =
      x.zip(y).map { case (p, q) => (p * q).toDouble }.sum
    d(a, b) / math.sqrt(d(a, a) * d(b, b))
  }

  test("normalization contract: components in [0, 2048], argmax at 2047") {
    val (v, u) = Similarity.powerIterate(spark, sfDir, 3)
    assert(v.forall(x => x >= 0 && x <= 2048))
    assert(v.max == BigInt(2047), s"argmax component was ${v.max}")
    assert(u.forall(_ >= 0))
  }

  test("direction converges: cosine(v_3, v_4) > 0.999") {
    val (v3, _) = Similarity.powerIterate(spark, sfDir, 3)
    val (v4, _) = Similarity.powerIterate(spark, sfDir, 4)
    val c = cosine(v3, v4)
    assert(c > 0.999, s"power iteration not converging: cos(v3, v4) = $c")
  }

  test("one round already moves off the uniform start vector") {
    val (v1, _) = Similarity.powerIterate(spark, sfDir, 1)
    assert(v1.distinct.size > 1, "M·v0 collapsed to a constant vector")
  }

  test("e25: energy ratios respect Cauchy-Schwarz and the top component is dominant") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.allButTop.run(spark, sfDir)
      .select(col("energy_removed_ppm")).collect().map(_.getLong(0))
    // s^2 <= ||v||^2 ||q||^2 exactly, so the ppm can never exceed 1e6
    assert(rows.forall(r => r >= 0L && r <= 1000000L))
    // a DOMINANT direction explains a large share of a nonnegative
    // corpus's energy — mean well above what a random axis would get
    val mean = rows.sum.toDouble / rows.length
    assert(mean > 500000.0, s"top component explains only ${mean / 10000}% on average")
  }
}
