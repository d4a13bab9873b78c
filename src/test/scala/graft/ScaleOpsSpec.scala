package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ScaleOps
import graft.operators.PrefixScan

/** Gates for the scale-planning operators:
  *  - t38 sequential Poisson sampling: the native bounded-heap plan ≡ the
  *    window definition, the sample is PPS-shaped (heavier docs
  *    overrepresented vs a uniform draw), and replays are byte-stable;
  *  - z2 range planner: buckets partition the key space (coverage +
  *    monotone ranges), the audit conserves rows, and the signed dev_ppm
  *    sums to ~0 (floor residue only);
  *  - o3 skyline: the linear prefix-max staircase ≡ the O(n²) dominance
  *    definition, exhaustively, on the real table;
  *  - j13 pricer: every priced number ≡ the same quantity measured on the
  *    MATERIALIZED self-join (the pricer never lies about the join it
  *    prevents);
  *  - runningMaxExclusive ≡ the global exclusive window at any bucketing.
  */
class ScaleOpsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  // ------------------------------------------------------------- prefix

  test("runningMaxExclusive equals the global exclusive window, any bucketing") {
    val df = spark.range(400).select(
      (col("id") % 37).as("t"), ((col("id") * 7919) % 101).as("v"), col("id"))
    val want = df.withColumn("m",
      max(col("v")).over(Window.orderBy(col("t"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    for (bucket <- Seq(col("t"), col("t") / 8, lit(0))) {
      val got = PrefixScan.runningMaxExclusive(
        df, bucket, Seq(col("t"), col("id")), col("v"), "m")
      assert(canon(got) == canon(want), s"bucket $bucket")
    }
  }

  // ---------------------------------------------------------------- t38

  test("t38: native bounded-heap plan equals the row_number window definition") {
    val got = ScaleOps.ppsSample.run(spark, sfDir)
    val base = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"),
        conv(substring(md5(concat(lit("pps:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
          .cast("long").as("u24"))
      .withColumn("sel_key", $"u24".cast("double") / $"n_tokens")
    val w = Window.partitionBy($"source").orderBy($"sel_key", $"doc_id")
    val want = base.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter($"sample_rank" <= ScaleOps.ppsK)
    assert(canon(got) == canon(want))
  }

  test("t38: the sample is PPS-shaped — selected docs are heavier than the stratum mean") {
    // Not a distributional hypothesis test: with k=8 of ~25 docs/source at
    // sf0.001 and weights spanning ~10×, PPS must pull the sampled mean
    // token count above the population mean in aggregate. A uniform
    // sampler (t9's shape) centers on the population mean instead.
    val docs = Tables.documents(spark, sfDir)
      .select($"source", size(split($"text", " ")).cast("long").as("n_tokens"))
    val popMean = docs.agg(avg($"n_tokens")).as[Double].head()
    val sampMean = ScaleOps.ppsSample.run(spark, sfDir)
      .agg(avg($"n_tokens")).as[Double].head()
    assert(sampMean > popMean,
      f"PPS sample mean $sampMean%.1f should exceed population mean $popMean%.1f")
  }

  test("t38: inclusion probability tracks weight on a controlled two-weight corpus") {
    // 400 units of weight 1 and 100 of weight 4 per stratum; k=8 via the
    // same u/w rule. Across 64 strata (64 independent draws), weight-4
    // units must win a clear majority of the 512 slots — the PPS
    // property itself, not just a mean shift.
    val df = spark.range(64L * 500).select(
      (col("id") % 64).cast("string").as("source"),
      col("id").as("doc_id"),
      when(col("id") % 500 < 100, 4L).otherwise(1L).as("n_tokens"))
      .withColumn("u24",
        conv(substring(md5(concat(lit("pps:"), $"doc_id".cast("string"))), 1, 6), 16, 10)
          .cast("long"))
      .withColumn("sel_key", $"u24".cast("double") / $"n_tokens")
    val top = graft.plans.TopKPerGroup.topK(df, Seq("source"),
      Seq(("sel_key", true), ("doc_id", true)), k = ScaleOps.ppsK)
    val heavy = top.filter($"n_tokens" === 4L).count()
    val total = top.count()
    assert(total == 64L * ScaleOps.ppsK)
    // E[heavy share] = 400/800 = 50% of slots despite being 20% of units;
    // require > 40% (uniform sampling would center on 20%)
    assert(heavy * 100 / total > 40,
      s"weight-4 units won $heavy of $total slots — not PPS-shaped")
  }

  // ----------------------------------------------------------------- z2

  test("z2: buckets conserve rows, ranges are disjoint-monotone, dev_ppm sums to floor residue") {
    val out = ScaleOps.rangePlanner.run(spark, sfDir).orderBy($"bucket").collect()
    val total = out.map(_.getAs[Long]("n_rows")).sum
    val liCount = Tables.lineitem(spark, sfDir).count()
    assert(total == liCount, "audit must conserve rows")
    // monotone, non-overlapping key ranges
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_cents") <= b.getAs[Long]("min_cents"),
          s"overlapping buckets ${a} ${b}")
      case _ =>
    }
    // signed ppm deviations cancel up to the per-bucket floor residue
    val devSum = out.map(_.getAs[Long]("dev_ppm")).sum
    assert(math.abs(devSum) <= out.length,
      s"dev_ppm sum $devSum exceeds floor residue bound ${out.length}")
  }

  test("z2: boundary list is sorted and respects the bucket count") {
    val bounds = ScaleOps.plannerBounds(spark, sfDir)
    assert(bounds == bounds.sorted)
    assert(bounds.size == ScaleOps.plannerBuckets - 1)
  }

  // ----------------------------------------------------------------- o3

  test("o3: prefix-max staircase equals the O(n^2) dominance skyline") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(to_date($"o_orderdate").as("order_day"))
      .agg(expr("max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))")
        .as("day_best_cents"),
        count(lit(1)).as("n_orders"))
    // brute force: a day is on the frontier iff NO strictly-earlier day
    // has an equal-or-better best value
    val a = daily.select($"order_day", $"day_best_cents")
    val dominated = a.as("x").join(a.as("y"),
      $"y.order_day" < $"x.order_day" && $"y.day_best_cents" >= $"x.day_best_cents")
      .select($"x.order_day").distinct()
    val want = daily.join(dominated, Seq("order_day"), "left_anti")
      .select($"order_day", $"day_best_cents", $"n_orders")
    val got = ScaleOps.skylineFrontier.run(spark, sfDir)
    assert(canon(got) == canon(want))
  }

  // ---------------------------------------------------------------- j13

  test("j13: every priced number matches the materialized self-join") {
    val priced = ScaleOps.selfJoinPrice.run(spark, sfDir).head()
    val ev = Tables.events(spark, sfDir).select($"event_id", $"user_id")
    val joined = ev.as("a").join(ev.as("b"), $"a.user_id" === $"b.user_id")
    val selfJoinRows = joined.count()
    val candPairs = ev.as("a").join(ev.as("b"),
      $"a.user_id" === $"b.user_id" && $"a.event_id" < $"b.event_id").count()
    assert(priced.getAs[Long]("self_join_rows") == selfJoinRows)
    // the synthetic events table can duplicate event_ids; candidate pairs
    // by distinct-row identity need a total per-key row order instead
    val c = ev.groupBy($"user_id").count().agg(
      sum(expr("count * (count - 1) div 2"))).as[Long].head()
    assert(priced.getAs[Long]("cand_pairs") == c)
    assert(candPairs <= selfJoinRows)
    assert(priced.getAs[Long]("n_rows") == ev.count())
    assert(priced.getAs[Boolean]("within_cap") ==
      (priced.getAs[Long]("cand_pairs") <= ScaleOps.selfJoinCap))
    // skew amplification ≥ 1e6 ppm by Cauchy–Schwarz (Σc² ≥ n²/k)
    assert(priced.getAs[Long]("skew_x_ppm") >= 999999L)
  }

  // ---------------------------------------------------------------- j14

  test("j14: the priced join size equals the materialized join, estimates reconcile") {
    val r = graft.queries.ScaleOps.joinPrice.run(spark, sfDir).head()
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val real = o.join(li, $"o_orderkey" === $"l_orderkey").count()
    assert(r.getAs[Long]("out_rows") == real)
    assert(r.getAs[Long]("n_a") == o.count() && r.getAs[Long]("n_b") == li.count())
    assert(r.getAs[Long]("matched_keys") <=
      math.min(r.getAs[Long]("ndv_a"), r.getAs[Long]("ndv_b")))
    assert(r.getAs[Long]("independence_est_rows") ==
      r.getAs[Long]("n_a") * r.getAs[Long]("n_b") /
        math.max(r.getAs[Long]("ndv_a"), r.getAs[Long]("ndv_b")))
    assert(r.getAs[Long]("top_key_ppm") >= 0 && r.getAs[Long]("top_key_ppm") <= 1000000L)
  }

  // ----------------------------------------------------------------- z3

  test("z3: every table present, verdict consistent with the estimate, counts honest") {
    val rows = ScaleOps.broadcastAdvisor.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet ==
      Set("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("broadcastable") ==
        (r.getAs[Long]("est_bytes") <= ScaleOps.broadcastThresholdBytes), r.toString)
    }
    val li = rows.find(_.getAs[String]("table_name") == "lineitem").get
    assert(li.getAs[Long]("n_rows") == Tables.lineitem(spark, sfDir).count())
    // the estimate is a payload lower bound: never below 8 bytes/row
    rows.filter(_.getAs[Long]("n_rows") > 0).foreach { r =>
      assert(r.getAs[Long]("est_bytes") >= 8 * r.getAs[Long]("n_rows"), r.toString)
    }
  }

  // ----------------------------------------------------------------- z4

  test("z4: exact ceilings off z3's byte model, floor of one partition, monotone in bytes") {
    val z3 = ScaleOps.broadcastAdvisor.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("est_bytes")).toMap
    val rows = ScaleOps.partitionAdvisor.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet == z3.keySet)
    def ceilDiv(a: Long, b: Long) = math.max(1L, (a + b - 1) / b)
    rows.foreach { r =>
      val b = r.getAs[Long]("est_bytes")
      assert(b == z3(r.getAs[String]("table_name")),
        s"z4 must share z3's byte model exactly: $r")
      assert(r.getAs[Long]("scan_partitions") ==
        ceilDiv(b, ScaleOps.maxPartitionBytes), r.toString)
      assert(r.getAs[Long]("shuffle_partitions") ==
        ceilDiv(b, ScaleOps.targetShuffleBytes), r.toString)
      // the 64 MiB shuffle point never plans FEWER partitions than the
      // 128 MiB scan split (ceil is monotone in 1/denominator)
      assert(r.getAs[Long]("shuffle_partitions") >= r.getAs[Long]("scan_partitions"))
    }
  }

  // ---------------------------------------------------------------- d23

  test("d23: buckets cover the verified pair list; agreement grid is the signature's") {
    val rows = graft.queries.Dedup.minhashCalibration.run(spark, sfDir).collect()
    // every verified pair lands in exactly one agreement bucket
    assert(rows.map(_.getAs[Long]("n_pairs")).sum ==
      graft.queries.Dedup.minhashPairs(spark, sfDir).count())
    rows.foreach { r =>
      val agree = r.getAs[Long]("agree")
      // verify threshold 0.5 on a 12-hash signature → agree ∈ [6, 12]
      assert(agree >= 6 && agree <= 12, r.toString)
      // |mean| ≤ MAE ≤ 1e6 by construction
      assert(math.abs(r.getAs[Long]("mean_err_ppm")) <= r.getAs[Long]("mae_ppm"))
      assert(r.getAs[Long]("mae_ppm") <= 1000000L)
    }
  }

  // ---------------------------------------------------------------- a33

  test("a33: sketch errors reconcile with the raw quantiles; sample never beats exact to zero rows") {
    val rows = graft.queries.Aggregations.a33SketchCalibration.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") <= math.min(256L, r.getAs[Long]("n_rows")))
      // re-derive each ppm from the emitted values (the audit can't
      // misreport its own numbers)
      assert(r.getAs[Long]("p50_err_ppm") ==
        math.abs(r.getAs[Long]("sk_p50") - r.getAs[Long]("ex_p50")) * 1000000L / r.getAs[Long]("ex_p50"))
      assert(r.getAs[Long]("p90_err_ppm") ==
        math.abs(r.getAs[Long]("sk_p90") - r.getAs[Long]("ex_p90")) * 1000000L / r.getAs[Long]("ex_p90"))
      // k=256 KMV on a smooth price distribution: errors should sit well
      // inside the O(1/sqrt(k)) ≈ 6% envelope — use 20% as the alarm line
      assert(r.getAs[Long]("p50_err_ppm") < 200000L, r.toString)
      assert(r.getAs[Long]("p90_err_ppm") < 200000L, r.toString)
    }
  }

  // ---------------------------------------------------------------- d22

  test("d22: blocking metrics reconcile with independent recounts") {
    val r = graft.queries.Dedup.blockingQuality.run(spark, sfDir).head()
    val nCand = r.getAs[Long]("n_cand")
    val nTruth = r.getAs[Long]("n_truth")
    val nCaught = r.getAs[Long]("n_caught")
    assert(nCaught <= math.min(nCand, nTruth))
    // independent recount of the candidate set
    assert(nCand == graft.queries.Dedup.bandCandidates(spark, sfDir).count())
    // verified pairs are a subset of candidates, so LSH-pair recall of the
    // verify tier is total: every d3 pair is caught by its own blocking
    val verified = graft.queries.Dedup.minhashPairs(spark, sfDir).count()
    assert(verified <= nCand)
    // reduction ratio consistent with n_docs
    val nDocs = r.getAs[Long]("n_docs")
    val possible = nDocs * (nDocs - 1) / 2
    assert(r.getAs[Long]("n_possible_pairs") == possible)
    assert(r.getAs[Long]("reduction_ppm") ==
      1000000L - nCand * 2000000L / (nDocs * (nDocs - 1)))
    // completeness/precision re-derive
    assert(r.getAs[Long]("completeness_ppm") == nCaught * 1000000L / nTruth)
    assert(r.getAs[Long]("precision_ppm") == nCaught * 1000000L / nCand)
  }
}
