package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Basket

/** Semantic gates for market-basket rules beyond the oracle parity:
  * the A-priori prune is LOSSLESS (pair support ≥ s implies both item
  * supports ≥ s, so pruning infrequent items before pair generation
  * changes nothing), metrics are internally consistent, and pair fanout
  * is bounded by the basket-size cap the scaladoc claims.
  */
class BasketSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val b = Basket.baskets(spark, sfDir).cache()

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("A-priori prune is lossless: minSupport=1 (no prune) emits the same rules") {
    // pairRules(minSupport = s) prunes items below s; rerunning with the
    // prune DISABLED (item threshold 1) but the same final pair_n >= 2 cut
    // must produce the identical rule set.
    val pruned = Basket.pairRules(b, minSupport = 2)
    val unpruned = Basket.pairRules(b, minSupport = 1)
      .filter(col("pair_n") >= 2)
    assert(canon(pruned) == canon(unpruned))
  }

  test("metric consistency: support/conf/lift recompute from the counts") {
    val rows = Basket.pairRules(b, minSupport = 2).collect()
    assert(rows.nonEmpty)
    val nBaskets = b.select(countDistinct($"o")).as[Long].head()
    rows.foreach { r =>
      val pairN = r.getAs[Long]("pair_n")
      val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
      assert(pairN >= 2 && nA >= pairN && nB >= pairN)
      assert(r.getAs[Long]("support_ppm") == math.floor(pairN * 1000000L / nBaskets.toDouble).toLong)
      assert(r.getAs[Long]("conf_ab_ppm") == math.floor(pairN * 1000000L / nA.toDouble).toLong)
      assert(r.getAs[Long]("conf_ba_ppm") == math.floor(pairN * 1000000L / nB.toDouble).toLong)
      assert(r.getAs[Long]("lift_ppm") ==
        math.floor(pairN * nBaskets * 1000000L / (nA * nB).toDouble).toLong)
    }
  }

  test("pair generation fanout is bounded by sum of per-basket k*(k-1)/2") {
    val maxK = b.groupBy($"o").count().agg(max($"count")).as[Long].head()
    val allPairs = Basket.pairRules(b, minSupport = 1) // pair_n >= 1 kept
    val bound = b.groupBy($"o").count()
      .agg(sum($"count" * ($"count" - 1) / 2)).as[Double].head()
    assert(maxK <= 16, s"basket-size cap assumption broke: $maxK")
    assert(allPairs.count() <= bound.toLong)
  }
}
