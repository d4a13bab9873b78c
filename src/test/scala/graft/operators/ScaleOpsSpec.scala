package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** Gates for the scale utilities: salted join result-equivalence and the
  * shuffle-free bucketed join.
  */
class ScaleOpsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("salted join ≡ plain join on a skewed dataset (inner and left)") {
    // 90% of probe rows share one key — the shape salting exists for
    val probe = spark.range(2000)
      .select((when($"id" % 10 === 0, $"id" % 7).otherwise(lit(42L))).as("k"),
        $"id".as("payload"))
    val build = spark.range(50).select($"id".as("k"), ($"id" * 100).as("info"))

    for (jt <- Seq("inner", "left")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select($"k", $"payload", $"info").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sorted.toSeq
      val salted = SkewJoin.saltedJoin(probe, build, "k", salt = 8, joinType = jt)
        .select($"k", $"payload", $"info").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sorted.toSeq
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("salted join spreads the hot key across salt partitions") {
    val probe = spark.range(1000).select(lit(1L).as("k"), $"id".as("payload"))
    val build = Seq((1L, "x")).toDF("k", "info")
    val salted = probe.withColumn("_salt", floor(rand(42L) * 8).cast("int"))
    // all 8 salt values actually used → the hot key occupies 8 reducers
    assert(salted.select("_salt").distinct.count() == 8)
    assert(SkewJoin.saltedJoin(probe, build, "k", 8).count() == 1000)
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-salt path)") {
    // AQE's skew handling splits oversized PARTITIONS after the shuffle
    // materializes — the first line of defense before explicit salting
    // (SkewJoin remains for single keys too hot for one task even split).
    // Thresholds are lowered so the test's ~1.4 MB hot partition counts
    // as skewed; production keeps the defaults (256 MB / 5x median).
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val probe = spark.range(200000)
        .select((when($"id" % 100 === 0, $"id" % 7).otherwise(lit(42L))).as("k"),
          concat(lit("payload-"), $"id").as("payload"))
      val build = spark.range(50)
        .select($"id".as("k"), concat(lit("info-"), $"id").as("info"))
      val joined = probe.join(build, "k")
      // execute joined's OWN QueryExecution (count() would plan a separate
      // aggregate query and leave this one un-finalized)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isSkew=true") || finalPlan.contains("skew="),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE demotes a sort-merge join to broadcast at runtime (stats were wrong)") {
    // The static planner sees no stats for a derived build side and plans
    // SMJ; AQE measures the materialized shuffle (a few KB) and converts
    // to BroadcastHashJoin at runtime. This is the recovery path for the
    // 100 TB case where a filter makes a "big" dim tiny and only runtime
    // sizes can know — the complement of the DPP pin (ScanLayoutSpec s7).
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // static: never broadcast; adaptive: broadcast under 1 MB
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1MB")
      val fact = spark.range(100000)
        .select(($"id" % 500).as("k"), concat(lit("p-"), $"id").as("payload"))
      // aggregation blocks static size estimation; runtime size ~KB
      val dim = spark.range(10000)
        .select(($"id" % 500).as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
      val joined = fact.join(dim, "k")
      val staticPlan = joined.queryExecution.executedPlan.toString
      assert(staticPlan.contains("SortMergeJoin"),
        s"precondition: static plan should be SMJ:\n$staticPlan")
      assert(joined.collect().length == 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE did not demote SMJ to broadcast:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    // shuffle.partitions is a cluster-wide guess; AQE folds tiny
    // post-shuffle partitions to the advisory size so a 32-partition
    // config doesn't produce 32 near-empty tasks per small stage. At
    // 100 TB the same mechanism keeps reducers right-sized per stage
    // instead of per job.
    val prev = Seq("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val agg = spark.range(10000)
        .select(($"id" % 97).as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
      assert(agg.collect().length == 97)
      val finalPlan = agg.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead coalesced"),
        s"AQE did not coalesce the shuffle read:\n$finalPlan")
      assert(agg.rdd.getNumPartitions < 64,
        s"still ${agg.rdd.getNumPartitions} partitions")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed silver layout: orders↔freight mart join is shuffle-free") {
    import graft.domain._
    val silver = Pipeline.toSilver(
      DataGen.bronzeJoor(spark, GenSpec(joor = 50), DomainConfig()),
      DataGen.bronzeShopify(spark, GenSpec(), DomainConfig()),
      DataGen.bronzeTiktok(spark, GenSpec(), DomainConfig()),
      DataGen.bronzeFreight(spark, GenSpec(freight = 60), DomainConfig()),
      DataGen.bronzeGsheets(spark, GenSpec(), DomainConfig()))
    Pipeline.writeSilverBucketed(silver, buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("silver_joor_orders_bucketed")
        .join(spark.table("silver_freight_data_bucketed"),
          $"order_id" === $"order_reference")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange"), s"bucketed silver join shuffles:\n$plan")
      assert(joined.count() ==
        silver.joor.join(silver.freight, $"order_id" === $"order_reference").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("adversarial skew soak: dedup family survives a hot-source, heavy-dup corpus") {
    // The driver gates run on benign synthetic data; this soaks the
    // dedup/cluster/funnel family on the adversarial shape VERDICT r3
    // called out: one source owns 80% of rows and duplicates are heavy
    // (32-copy groups). The properties under test are the SCALE
    // guarantees: no plan degenerates to a cartesian, the d2 frequency
    // cap bounds the postings self-join, d3's in-bucket pair count stays
    // Σ(group²) not corpus², d5's edge list stays under the driver
    // union-find threshold, and the whole family completes inside a
    // generous wall bound on local[4].
    val nDocs = 40000
    val dupGroup = 32
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // m = id%20: 16 slots (80%) → 'hot'; the rest → src0..src3. Hot rows
    // share one text per (id div 20) % 1250 base → ~32 copies per base;
    // half the src0 (eval) rows REUSE train bases so decontamination and
    // cross-split near-dup both fire on the skewed data.
    val m = pmod($"id", lit(20))
    val windowIdx = ($"id" / 20).cast("long")
    val base = when(m < 16, pmod(windowIdx, lit(nDocs / dupGroup)))
      .when(m === 16 && pmod(windowIdx, lit(2)) === 0, pmod(windowIdx, lit(nDocs / dupGroup)))
      .otherwise(lit(100000L) + $"id")
    val text = array_join(
      transform(sequence(lit(0), lit(29)),
        i => concat(lit("w"), pmod(xxhash64(base, i), lit(5000)))), " ")
    spark.range(nDocs)
      .select(
        $"id".as("doc_id"),
        text.as("text"),
        lit("en").as("lang"),
        when(m < 16, "hot").otherwise(concat(lit("src"), m - 16)).as("source"),
        length(text).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    import graft.queries.{Dedup, TrainingPrep}
    val family = Seq(
      "d2" -> Dedup.jaccard, "d3" -> Dedup.minhashLsh,
      "d5" -> DupClusters.dupClustersQ, "c1" -> TrainingPrep.curationFunnel)

    // cartesian-freedom on the declarative plans (d5 runs eagerly through
    // the driver union-find, so its guarantee is the d3 pair plan it
    // consumes plus the edge-count bound asserted below)
    for ((name, q) <- Seq("d2" -> Dedup.jaccard, "d3" -> Dedup.minhashLsh,
        "c1" -> TrainingPrep.curationFunnel)) {
      val p = q.run(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("simple"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated to a cartesian on the skewed corpus:\n$p")
    }

    val t0 = System.nanoTime()
    val counts = family.map { case (name, q) => name -> q.run(spark, dir).count() }.toMap
    val wallSec = (System.nanoTime() - t0) / 1e9

    // the dup structure must actually be seen (non-vacuous soak)…
    assert(counts("d3") > 100000, s"d3 found ${counts("d3")} pairs — dup groups not exercised")
    assert(counts("d5") == nDocs, s"d5 must assign every doc a cluster: ${counts("d5")}")
    assert(counts("c1") == 5)
    // …the d3 edge list stays inside the driver union-find regime…
    assert(counts("d3") < 10000000L, "edge list crossed the BSP threshold — soak shape wrong")
    // …and the family finishes inside a generous local[4] bound (the
    // failure mode being guarded is quadratic blowup: minutes → hours)
    assert(wallSec < 300.0, f"skew soak took $wallSec%.0f s — quadratic blowup likely")

    // duplicate collapse is visible end-to-end: the hot source's 32-copy
    // groups collapse to one canonical each (1250 distinct hot texts +
    // 6000 unique cold-train docs = 7250 survivors of 38000 train rows)
    val stages = TrainingPrep.curationFunnel.run(spark, dir)
      .select($"stage", $"n_docs").as[(String, Long)].collect().toMap
    assert(stages("s1_exact_dedup") < stages("s0_raw") / 4,
      s"exact dedup did not collapse the heavy dups: $stages")
  }

  test("bucketed join plans with zero Exchange") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey".as("k"), $"l_extendedprice")
    val o = Tables.orders(spark, sfDir).select($"o_orderkey".as("k"), $"o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "k", buckets = 8)
    Bucketing.writeBucketed(o, "b_orders", "k", buckets = 8)

    // at this size the planner rightly prefers broadcast (and disables
    // bucketing); force the shuffle-join regime — the one bucketing
    // exists for — to observe the zero-Exchange sort-merge join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "k")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // and it is the same result as the unbucketed join
      assert(joined.count() == li.join(o, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
