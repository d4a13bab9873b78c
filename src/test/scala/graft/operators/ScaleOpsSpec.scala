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
