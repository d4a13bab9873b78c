package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit
import graft.domain.{DataGen, DomainConfig, GenSpec, Schemas}

/** S8/S9/S10 — the remaining source/sink shapes. */
class SinksSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private val cfg = DomainConfig()
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("S9 bronze sink: topic/date-partitioned single-line JSON envelopes") {
    val srcDir = tmp("src")
    val outDir = tmp("bronze-out")
    DataGen.bronzeJoor(spark, GenSpec(joor = 20), cfg)
      .write.mode("append").json(srcDir)

    val q = StreamingIngest.bronzeSink(
      spark.readStream.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(srcDir),
      outDir, tmp("ckpt")).start()
    q.awaitTermination()

    // layout: topic=<topic>/ingest_date=<yyyy-MM-dd>/*.json
    val topicDirs = new java.io.File(outDir).listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(topicDirs.contains("topic=raw-joor-orders"), topicDirs.toSeq)
    val back = spark.read
      .schema(Schemas.bronzeEnvelope(Schemas.joorRaw))
      .json(s"$outDir/topic=raw-joor-orders/*/")
    assert(back.count() == 20)
    // envelope shape round-trips (one JSON object per line)
    assert(back.select("raw_api_data.order_id").distinct.count() == 20)
  }

  test("S8 kafka value encoding: to_json(struct(*)) round-trips") {
    val silver = Seq(("o1", "Ava", 19.9, 2, "SKU-1")).toDF(
      "order_id", "buyer", "price", "quantity", "sku")
    val value = StreamingIngest.toKafkaValue(silver).first.getString(0)
    val parsed = spark.range(1).select(
      from_json(lit(value), org.apache.spark.sql.types.StructType.fromDDL(
        "order_id string, buyer string, price double, quantity int, sku string")).as("v"))
      .select("v.*").first
    assert(parsed.getString(0) == "o1" && parsed.getDouble(2) == 19.9)
  }

  test("stream-stream join: orders meet freight within the match window") {
    val joorDir = tmp("ss-joor")
    val freightDir = tmp("ss-freight")
    val outDir = tmp("ss-out")
    // linked freight: order_refs point at real joor order ids (same seed
    // derivation); bronze timestamps all within the match window
    val spec = GenSpec(joor = 40, freight = 60, linkedFreight = true)
    DataGen.bronzeJoor(spark, spec, cfg).write.mode("append").json(joorDir)
    DataGen.bronzeFreight(spark, spec, cfg).write.mode("append").json(freightDir)

    val orders = StreamingIngest.cleanseStream(
      StreamingIngest.readBronzeStream(spark, joorDir, Schemas.joorRaw), "joor_orders")
    val freight = StreamingIngest.cleanseStream(
      StreamingIngest.readBronzeStream(spark, freightDir, Schemas.freightRaw), "freight_data")

    val q = StreamingIngest.ordersWithFreightStream(orders, freight)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", tmp("ss-ckpt"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.read.parquet(outDir)
    // batch reference: same join over the cleansed batch frames
    // same equi + time-range predicate as the streaming join (freight at
    // or after the order, within the window)
    val bo = graft.domain.Cleanse.joor(graft.domain.Cleanse.flatten(
      spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(joorDir)))
      .withColumn("ot", to_timestamp($"bronze_timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    val bf = graft.domain.Cleanse.freight(graft.domain.Cleanse.flatten(
      spark.read.schema(Schemas.bronzeEnvelope(Schemas.freightRaw)).json(freightDir)))
      .withColumn("ft", to_timestamp($"bronze_timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    val expected = bo.join(bf,
      bo("order_id") === bf("order_reference") &&
        bf("ft") >= bo("ot") &&
        bf("ft") <= bo("ot") + expr("INTERVAL 30 minutes")).count()
    assert(got.count() == expected, s"stream-stream ${got.count()} vs batch $expected")
    assert(expected > 0, "fixture produced no matches — test is vacuous")
  }

  test("streaming upsert sink: bucketed snapshot merges inserts/updates across batches") {
    import org.apache.spark.sql.types.StructType
    val srcDir = tmp("ups-src")
    val snap = tmp("ups-root") + "/snapshot"
    val ckpt = tmp("ups-ckpt")
    val ddl = "order_id string, status string, seq bigint"

    def runOnce(): Unit = {
      val q = StreamingIngest.upsertSink(
        spark.readStream.schema(StructType.fromDDL(ddl)).json(srcDir),
        "order_id", "seq", snap, ckpt, nBuckets = 4).start()
      q.awaitTermination()
    }
    def snapshot(): Map[String, String] =
      spark.read.parquet(snap).select("order_id", "status")
        .as[(String, String)].collect().toMap

    Seq(("o1", "new", 1L), ("o2", "new", 1L))
      .toDF("order_id", "status", "seq").write.mode("append").json(srcDir)
    runOnce()
    assert(snapshot() == Map("o1" -> "new", "o2" -> "new"))

    // update o2 (intra-batch duplicate: highest seq must win), insert o3
    val batch2 = Seq(("o2", "shipped", 3L), ("o2", "packed", 2L), ("o3", "new", 1L))
      .toDF("order_id", "status", "seq")
    batch2.write.mode("append").json(srcDir)
    runOnce()
    val s2 = snapshot()
    assert(s2 == Map("o1" -> "new", "o2" -> "shipped", "o3" -> "new"))

    // exactly-once: a drain with no new data must not change the snapshot
    runOnce()
    assert(snapshot() == s2)

    // idempotent merge: replaying the SAME batch directly converges
    StreamingIngest.mergeIntoSnapshot(batch2, "order_id", "seq", snap, nBuckets = 4)
    assert(snapshot() == s2)

    // the scale property: snapshot is hash-bucket partitioned
    val buckets = new java.io.File(snap).listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(buckets.nonEmpty && buckets.forall(_.startsWith("__bucket=")), buckets.toSeq)
  }

  test("upsert merge edges: null keys dropped, empty batch no-op, ties deterministic, bucket mismatch refused") {
    val snap = tmp("ups2-root") + "/snapshot"
    def read(): Map[String, String] =
      spark.read.parquet(snap).select("order_id", "status")
        .as[(String, String)].collect().toMap

    // an empty FIRST batch must not create a part-less snapshot dir
    val empty = Seq.empty[(String, String, Long)].toDF("order_id", "status", "seq")
    StreamingIngest.mergeIntoSnapshot(empty, "order_id", "seq", snap, nBuckets = 4)
    assert(!new java.io.File(snap).exists())

    // null keys have no merge identity — dropped, not crashed on
    val b1 = Seq(("k1", "a", 1L), (null.asInstanceOf[String], "x", 9L))
      .toDF("order_id", "status", "seq")
    StreamingIngest.mergeIntoSnapshot(b1, "order_id", "seq", snap, nBuckets = 4)
    assert(read() == Map("k1" -> "a"))

    // an empty batch against an existing snapshot is a no-op
    StreamingIngest.mergeIntoSnapshot(empty, "order_id", "seq", snap, nBuckets = 4)
    assert(read() == Map("k1" -> "a"))

    // equal-seq ties resolve deterministically (remaining columns asc:
    // "packed" < "shipped") — and identically on replay
    val tie = Seq(("k2", "shipped", 5L), ("k2", "packed", 5L))
      .toDF("order_id", "status", "seq")
    StreamingIngest.mergeIntoSnapshot(tie, "order_id", "seq", snap, nBuckets = 4)
    assert(read() == Map("k1" -> "a", "k2" -> "packed"))
    StreamingIngest.mergeIntoSnapshot(tie, "order_id", "seq", snap, nBuckets = 4)
    assert(read() == Map("k1" -> "a", "k2" -> "packed"))

    // a different nBuckets would scatter keys across mismatched buckets
    // (silent duplicates) — must refuse
    intercept[IllegalArgumentException] {
      StreamingIngest.mergeIntoSnapshot(tie, "order_id", "seq", snap, nBuckets = 8)
    }
  }

  test("upsert chaos: duplicate and out-of-order kafka offsets converge to max-offset rows") {
    // A real consumer feeding the upsert sink sees at-least-once delivery:
    // offsets arrive out of order across micro-batches, stale offsets show
    // up AFTER newer ones, and whole batches replay on crash. The merge
    // keyed on (key, max seq=offset) must converge to the per-key
    // max-offset row through all of it.
    import org.apache.spark.sql.types.StructType
    val srcDir = tmp("chaos-src")
    val snap = tmp("chaos-root") + "/snapshot"
    val ckpt = tmp("chaos-ckpt")
    val ddl = "order_id string, status string, offset bigint"

    def runOnce(): Unit = {
      val q = StreamingIngest.upsertSink(
        spark.readStream.schema(StructType.fromDDL(ddl)).json(srcDir),
        "order_id", "offset", snap, ckpt, nBuckets = 4).start()
      q.awaitTermination()
    }
    def snapshot(): Map[String, (String, Long)] =
      spark.read.parquet(snap).select("order_id", "status", "offset")
        .as[(String, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // batch 1: k1 delivered out of order within the batch (5 before 3),
    // k2 in order
    val batch1 = Seq(("k1", "shipped", 5L), ("k1", "packed", 3L), ("k2", "new", 1L))
      .toDF("order_id", "status", "offset")
    batch1.write.mode("append").json(srcDir)
    runOnce()
    assert(snapshot() == Map("k1" -> ("shipped", 5L), "k2" -> ("new", 1L)))

    // batch 2: a STALE offset for k1 arrives after the newer one was
    // applied (must not regress), plus an exact duplicate redelivery of
    // offset 5, plus k2 progress
    val batch2 = Seq(("k1", "packed", 4L), ("k1", "shipped", 5L), ("k2", "paid", 2L))
      .toDF("order_id", "status", "offset")
    batch2.write.mode("append").json(srcDir)
    runOnce()
    val converged = Map("k1" -> ("shipped", 5L), "k2" -> ("paid", 2L))
    assert(snapshot() == converged, s"stale offset regressed the snapshot: ${snapshot()}")

    // crash-replay: the SAME batch re-merged directly (foreachBatch
    // redelivery) changes nothing
    StreamingIngest.mergeIntoSnapshot(batch2, "order_id", "offset", snap, nBuckets = 4)
    assert(snapshot() == converged)
    // and replaying batch 1 — an ENTIRELY stale batch — also changes nothing
    StreamingIngest.mergeIntoSnapshot(batch1, "order_id", "offset", snap, nBuckets = 4)
    assert(snapshot() == converged)
  }

  test("S10 cdc-ish poll source: rate ticks become gap-free joor envelopes") {
    val src = StreamingIngest.cdcPollSource(spark, rowsPerSecond = 50)
    assert(src.isStreaming)
    assert(src.schema.fieldNames.toSeq == Seq("raw_api_data", "kafka_metadata"))

    val outDir = tmp("cdc-out")
    val q = src.writeStream
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", tmp("cdc-ckpt"))
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    // let a few micro-batches run, then stop
    Thread.sleep(4000)
    q.stop()
    q.awaitTermination()

    val got = spark.read
      .schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(outDir)
    val offsets = got.select("kafka_metadata.offset")
      .collect().map(_.getLong(0)).sorted
    assert(offsets.nonEmpty, "no rate rows were produced")
    // gap-free: offsets are exactly 0..n-1 — the property the reference's
    // clock-window poll does NOT have
    assert(offsets.toSeq == (0L until offsets.length).toSeq)
  }
}
