package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.domain._

/** Property-based invariants (SURVEY §5.4) over generated silver rows:
  * the margin waterfall, rollup conservation, geography totality, cleanse
  * null-safety, and the cross-engine decimal discipline.
  */
class PropertySpec extends AnyFunSuite with SparkTestKit {

  /** Deterministic forAll: evaluate the generator under `trials` fixed
    * seeds (scalatestplus isn't on the offline classpath; raw ScalaCheck
    * sampling keeps the property style AND reproducibility).
    */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 5)(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(
        fail(s"generator failed for seed $i")))
    }

  import spark.implicits._

  private val cfg = DomainConfig()

  private val silverRowGen: Gen[(String, String, Double, Int, String)] = for {
    oid <- Gen.identifier.map(_.take(12))
    buyer <- Gen.oneOf("London Fashion House", "Acme Apparel", "Tokyo Threads",
      "Plain Buyer", "EU Group", "Zephyr Styles")
    price <- Gen.chooseNum(1, 50000).map(_ / 100.0) // clean 2-dp money
    qty <- Gen.chooseNum(1, 100)
    sku <- Gen.identifier.map("SKU-" + _.take(6))
  } yield (oid, buyer, price, qty, sku)

  test("CM2 joor waterfall holds for arbitrary silver rows") {
    forAllSeeded(Gen.listOfN(30, silverRowGen)) { rows =>
      {
        val silver = rows.toDF("order_id", "buyer", "price", "quantity", "sku")
        val freight = Seq.empty[(String, String, Double, String)]
          .toDF("tracking_number", "provider", "cost", "order_reference")
        val cm2 = Cm2.joor(Cm1.joor(silver, cfg), freight, cfg)
        val bad = cm2.filter(
          abs(col("cm2_amount") -
            (col("net_revenue") - col("production_cost") - col("production_comm")
              - col("trx_fees") - col("freight_in") - col("freight_out"))) > 1e-9)
          .count()
        assert(bad == 0)
        // unmatched freight → defaults everywhere
        assert(cm2.filter(col("freight_out") =!= 15.0).count() == 0)
        assert(cm2.filter(col("freight_out_status") =!= "not shipped yet").count() == 0)
      }
    }
  }

  test("rollup conserves qty and item count across arbitrary groupings") {
    forAllSeeded(Gen.listOfN(40, silverRowGen)) { rows =>
      {
        val silver = rows.toDF("order_id", "buyer", "price", "quantity", "sku")
        val cm1 = Cm1.joor(silver, cfg)
        val totalQty = rows.map(_._4.toLong).sum
        val rolledQty = cm1.groupBy(col("order_no"))
          .agg(sum(col("qty")).as("q")).agg(sum(col("q"))).first.getLong(0)
        assert(rolledQty == totalQty)
      }
    }
  }

  test("geography is total: every assigned country maps to a non-null region") {
    val countries =
      Geography.joorPatterns.map(_._2) ++ Geography.joorResidual.map(_._2) ++
        Geography.shopifyResidual.map(_._2) ++ Geography.tiktokResidual.map(_._2) ++
        Seq(Geography.joorResidualDefault, Geography.shopifyResidualDefault,
          Geography.tiktokResidualDefault)
    val df = countries.distinct.toDF("country")
    for (buckets <- Seq(Geography.joorRegions, Geography.shopifyRegions, Geography.tiktokRegions)) {
      val out = df.select(Geography.region(col("country"), buckets).as("r"))
      assert(out.filter(col("r").isNull).count() == 0)
    }
  }

  test("cleanse never emits nulls, for arbitrary messy payloads") {
    val messyGen: Gen[(Option[String], Option[String], Option[Int], Option[String])] = for {
      oid <- Gen.option(Gen.identifier.map(_.take(8)))
      price <- Gen.option(Gen.oneOf("19.99", "garbage", "", "0", "-3.5", "1e3"))
      qty <- Gen.option(Gen.chooseNum(-5, 100))
      sku <- Gen.option(Gen.identifier.map(_.take(6)))
    } yield (oid, price, qty, sku)
    forAllSeeded(Gen.listOfN(25, messyGen)) { rows =>
      {
        val flat = rows.toDF("order_id", "price", "quantity", "sku")
          .withColumn("buyer", lit(null).cast("string"))
          .withColumn("bronze_timestamp", lit("2025-07-04T10:00:00.000000"))
        val out = Cleanse.joor(flat)
        val anyNull = out.columns.map(c => sum(col(c).isNull.cast("int")))
          .reduce(_ + _)
        assert(out.agg(anyNull).first.getLong(0) == 0)
      }
    }
  }

  test("decimal discipline: cents∘dec2 is identity on clean 2-dp money") {
    forAllSeeded(Gen.listOfN(50, Gen.chooseNum(-10000000L, 10000000L).map(_ / 100.0))) { vals =>
      {
        val df = vals.toDF("x")
        val bad = df.filter(queries.Exact.cents(queries.Exact.dec2(col("x"))) =!= col("x")).count()
        assert(bad == 0)
      }
    }
  }
}
