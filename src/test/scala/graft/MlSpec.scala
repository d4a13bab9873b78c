package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Ml

/** Semantic gates for the closed-form regression family beyond oracle
  * parity: the CRAMER IDENTITY — M·w_num = b·det must hold EXACTLY in
  * unbounded integer arithmetic (it is an algebraic identity of the
  * cofactor expansion; any width/overflow bug in the decimal discipline
  * breaks it loudly) — and ridge(λ=0) ≡ OLS.
  */
class MlSpec extends AnyFunSuite with SparkTestKit {

  private def bigRow(df: org.apache.spark.sql.DataFrame): Map[String, BigInt] = {
    val r = df.head()
    df.schema.fieldNames.zipWithIndex.map { case (n, i) =>
      n -> BigInt(r.getDecimal(i).toBigInteger)
    }.toMap
  }

  test("Cramer identity: M · [det0,det1,det2] == b · det, exactly") {
    val cr = Ml.cramer(Ml.stats(Ml.features(spark, sfDir)), 0L)
    val v = bigRow(cr)
    val (n, sx1, sx2) = (v("n"), v("sx1"), v("sx2"))
    val (sx11, sx12, sx22) = (v("sx11"), v("sx12"), v("sx22"))
    val (b1, b2, b3) = (v("sy"), v("sx1y"), v("sx2y"))
    val (det, d0, d1, d2) = (v("det"), v("det0"), v("det1"), v("det2"))
    assert(det != BigInt(0), "features are collinear — det(M) = 0")
    // row i of M times the numerator vector equals det * b_i
    assert(n * d0 + sx1 * d1 + sx2 * d2 == det * b1)
    assert(sx1 * d0 + sx11 * d1 + sx12 * d2 == det * b2)
    assert(sx2 * d0 + sx12 * d1 + sx22 * d2 == det * b3)
  }

  test("ridge with lambda=0 degenerates to the OLS solution") {
    val ols = Ml.cramer(Ml.stats(Ml.features(spark, sfDir)), 0L)
    val ridge0 = Ml.cramer(Ml.stats(Ml.features(spark, sfDir)), 0L)
    val a = bigRow(ols); val b = bigRow(ridge0)
    assert(a == b)
    // and a nonzero lambda must actually change the solution
    val r = bigRow(Ml.cramer(Ml.stats(Ml.features(spark, sfDir)), 256L))
    assert(r("det") != a("det"))
  }

  test("ml1 R2 is a genuine fit: 0 < r2 <= 1 and n_chars ~ tokens is strong") {
    val row = Ml.ml1NormalEq.run(spark, sfDir).head()
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0.5 && r2 <= 1.0, s"expected a strong token→chars fit, got r2=$r2")
  }

  test("ml2 quantized-weight MSE is consistent with ml1's exact SSE") {
    // ridge-quantized weights can't beat the exact OLS optimum: the OLS
    // SSE derived from ml1's outputs must lower-bound ml2's MSE·n
    val m1 = Ml.ml1NormalEq.run(spark, sfDir).head()
    val m2 = Ml.ml2Ridge.run(spark, sfDir).head()
    val n = m1.getAs[Long]("n_docs").toDouble
    val r2 = m1.getAs[Double]("r2")
    // reconstruct OLS mse from r2 and SST
    val f = Ml.features(spark, sfDir)
    import org.apache.spark.sql.functions._
    val s = f.agg(count(lit(1)).cast("double").as("n"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("y") * col("y")).cast("double").as("syy")).head()
    val sst = s.getAs[Double]("syy") - s.getAs[Double]("sy") * s.getAs[Double]("sy") / n
    val olsMse = (1.0 - r2) * sst / n
    val ridgeMse = m2.getAs[Double]("mse_chars2")
    assert(ridgeMse >= olsMse - 1e-6,
      s"quantized ridge MSE $ridgeMse beat the OLS optimum $olsMse")
    // and it should still be in the same ballpark (quantization is 2^-20)
    assert(ridgeMse < olsMse * 2 + 1.0, s"ridge MSE $ridgeMse is wildly off OLS $olsMse")
  }

  test("t33 flags at most 10% + ties, and residuals recompute from ml2's weights") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Ml.modelQualityFilter.run(spark, sfDir).cache()
    val n = out.count()
    val flagged = out.filter($"is_outlier").count()
    // percentile_disc(0.9) is a member; strict > flags at MOST 10%
    assert(flagged <= n / 10, s"$flagged of $n flagged — threshold broke")
    assert(flagged > 0, "nothing flagged — the filter is inert")
    // residuals consistent with the ml2 weight row
    val m2 = Ml.ml2Ridge.run(spark, sfDir).collect().head
    val (w0, w1, w2) = (m2.getAs[Long]("wq_intercept"),
      m2.getAs[Long]("wq_ws_tokens"), m2.getAs[Long]("wq_distinct_tokens"))
    val recomputed = Ml.features(spark, sfDir)
      .select($"doc_id",
        abs(lit(Ml.Q20) * $"y" - (lit(w0) + lit(w1) * $"x1" + lit(w2) * $"x2"))
          .cast("long").as("ar"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(r.getAs[Long]("abs_residual_q20") == recomputed(r.getAs[Long]("doc_id")))
    }
  }

  test("ml3 per-group slopes match an exact BigInt recompute of the daily rollup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Ml.ml3GroupTrend.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("priority") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("slope_cents_per_day"))).toMap
    val daily = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("priority"),
        (expr("unix_micros(o_orderdate) div 86400000000") - 8000).as("x"))
      .agg(sum((graft.queries.Exact.dec2($"o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getAs[String]("priority"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    daily.groupBy(_._1).foreach { case (p, rows) =>
      val n = BigInt(rows.size)
      val sx = rows.map(r => BigInt(r._2)).sum
      val sy = rows.map(r => BigInt(r._3)).sum
      val sxx = rows.map(r => BigInt(r._2) * r._2).sum
      val sxy = rows.map(r => BigInt(r._2) * r._3).sum
      val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
      val want = num.toDouble / den.toDouble
      val (nDays, slope) = got(p)
      assert(nDays == rows.size.toLong)
      assert(math.abs(slope - want) <= math.abs(want) * 1e-12 + 1e-12,
        s"group $p slope $slope != BigInt recompute $want")
    }
  }
}
