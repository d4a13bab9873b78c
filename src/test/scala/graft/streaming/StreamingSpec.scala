package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit
import graft.domain.{Cleanse, DataGen, DomainConfig, GenSpec, Schemas}

/** Streaming ingest end-to-end on the file source: bronze JSON files →
  * streaming cleanse → silver parquet, with incremental second batches,
  * exactly-once restarts, and the windowed/dedup stateful ops.
  */
class StreamingSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private val cfg = DomainConfig()

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def writeBronzeBatch(dir: String, spec: GenSpec): Unit =
    DataGen.bronzeJoor(spark, spec, cfg)
      .write.mode("append").json(dir)

  test("file-source stream: bronze → silver parquet, then incremental batch") {
    val bronzeDir = tmp("bronze")
    val silverDir = tmp("silver")
    val ckptDir = tmp("ckpt")

    writeBronzeBatch(bronzeDir, GenSpec(joor = 50))
    val stream = StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw)
    assert(stream.isStreaming)

    val q1 = StreamingIngest.silverSink(
      StreamingIngest.cleanseStream(stream, "joor_orders"),
      silverDir, ckptDir).start()
    q1.awaitTermination()
    assert(spark.read.parquet(silverDir).count() == 50)

    // second micro-batch: only NEW files are processed (source offsets
    // subsume the reference's high-watermark checkpoint)
    writeBronzeBatch(bronzeDir, GenSpec(joor = 30, seed = 43))
    val q2 = StreamingIngest.silverSink(
      StreamingIngest.cleanseStream(
        StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"),
      silverDir, ckptDir).start()
    q2.awaitTermination()
    val silver = spark.read.parquet(silverDir)
    assert(silver.count() == 80)

    // restart with same checkpoint and no new data → exactly-once, no dups
    val q3 = StreamingIngest.silverSink(
      StreamingIngest.cleanseStream(
        StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"),
      silverDir, ckptDir).start()
    q3.awaitTermination()
    assert(spark.read.parquet(silverDir).count() == 80)

    // streaming cleanse ≡ batch cleanse on the same bronze files
    val batch = Cleanse.joor(Cleanse.flatten(
      spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(bronzeDir)))
    assert(silver.select("order_id").collect().map(_.getString(0)).sorted.toSeq ==
      batch.select("order_id").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("windowed daily revenue with watermark emits per-day totals") {
    val bronzeDir = tmp("bronze2")
    writeBronzeBatch(bronzeDir, GenSpec(joor = 40))
    val out = tmp("rev")
    val q = StreamingIngest.dailyRevenue(
      StreamingIngest.cleanseStream(
        StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"),
      channel = "joor")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", tmp("ckpt2"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode only emits CLOSED windows (past the watermark) — rerun
    // with a far-future batch is out of scope; assert the sink schema and
    // that state machinery ran without error
    val result = spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(
        "date_key string, channel_id string, gross_revenue double, n_orders bigint"))
      .parquet(out)
    assert(result.columns.toSeq ==
      Seq("date_key", "channel_id", "gross_revenue", "n_orders"))
  }

  test("dropDuplicatesWithinWatermark removes replayed order ids") {
    val bronzeDir = tmp("bronze3")
    // same seed written twice = an exact replay (at-least-once delivery)
    writeBronzeBatch(bronzeDir, GenSpec(joor = 25))
    writeBronzeBatch(bronzeDir, GenSpec(joor = 25))
    val out = tmp("dedup")
    val q = StreamingIngest.dedupOrders(
      StreamingIngest.cleanseStream(
        StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"))
      .drop("event_time")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", tmp("ckpt3"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == 25)
    assert(got.select("order_id").distinct.count() == 25)
  }

  test("flatMapGroupsWithState: buyer profiles accumulate across micro-batches") {
    val bronzeDir = tmp("bronze4")
    val outDir = tmp("profiles")
    val ckpt = tmp("ckpt4")

    def drain(): Unit = {
      // update-mode state output → file sink via foreachBatch (the
      // standard pattern: file sinks are append-only)
      val q = StreamingIngest.buyerProfiles(
        StreamingIngest.cleanseStream(
          StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[BuyerProfile], _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBronzeBatch(bronzeDir, GenSpec(joor = 40))
    drain()
    writeBronzeBatch(bronzeDir, GenSpec(joor = 40, seed = 99))
    drain()

    // the LAST emitted profile per buyer covers both batches
    val latest = spark.read.parquet(outDir)
      .groupBy($"buyer").agg(max($"n_orders").as("n_orders"))
    val total = latest.agg(org.apache.spark.sql.functions.sum($"n_orders")).first.getLong(0)
    assert(total == 80, s"state lost across batches: $total")

    // and matches a batch recomputation over all bronze
    val batchCounts = Cleanse.joor(Cleanse.flatten(
      spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(bronzeDir)))
      .groupBy($"buyer").count()
    val mismatch = latest.join(batchCounts, Seq("buyer"))
      .filter($"n_orders" =!= $"count").count()
    assert(mismatch == 0)
  }

  test("transformWithState (state v2, RocksDB): profiles match v1 and batch") {
    val bronzeDir = tmp("bronze5")
    val outDir = tmp("profilesv2")
    val ckpt = tmp("ckpt5")
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def drain(): Unit = {
        val q = StreamingIngest.buyerProfilesV2(
          StreamingIngest.cleanseStream(
            StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[BuyerProfile], _: Long) =>
            batch.write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      writeBronzeBatch(bronzeDir, GenSpec(joor = 40))
      drain()
      writeBronzeBatch(bronzeDir, GenSpec(joor = 40, seed = 99))
      drain()

      val latest = spark.read.parquet(outDir)
        .groupBy($"buyer").agg(max($"n_orders").as("n_orders"))
      val total = latest.agg(org.apache.spark.sql.functions.sum($"n_orders")).first.getLong(0)
      assert(total == 80, s"state lost across batches: $total")
      val batchCounts = Cleanse.joor(Cleanse.flatten(
        spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(bronzeDir)))
        .groupBy($"buyer").count()
      val mismatch = latest.join(batchCounts, Seq("buyer"))
        .filter($"n_orders" =!= $"count").count()
      assert(mismatch == 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState: per-buyer sku counts match batch recompute") {
    val bronzeDir = tmp("bronze6")
    val outDir = tmp("skucounts")
    val ckpt = tmp("ckpt6")
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def drain(): Unit = {
        val q = StreamingIngest.buyerSkuCounts(
          StreamingIngest.cleanseStream(
            StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"))
          .toDF("buyer", "sku", "n")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      writeBronzeBatch(bronzeDir, GenSpec(joor = 40))
      drain()
      writeBronzeBatch(bronzeDir, GenSpec(joor = 40, seed = 99))
      drain()

      // the LAST emitted count per (buyer, sku) is the lifetime count
      val latest = spark.read.parquet(outDir)
        .groupBy($"buyer", $"sku").agg(max($"n").as("n"))
      val batchCounts = Cleanse.joor(Cleanse.flatten(
        spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(bronzeDir)))
        .groupBy($"buyer", $"sku").count()
      val mismatch = latest.join(batchCounts, Seq("buyer", "sku"), "full")
        .filter($"n" =!= $"count" || $"n".isNull || $"count".isNull).count()
      assert(mismatch == 0)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers: sessions close when the watermark passes, once") {
    val srcDir = tmp("timer-src")
    val outDir = tmp("timer-out")
    val ckpt = tmp("timer-ckpt")
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = "user STRING, event_time TIMESTAMP"
      def writeEvents(rows: (String, String)*): Unit =
        rows.toSeq.toDF("user", "ts")
          .selectExpr("user", "CAST(ts AS TIMESTAMP) AS event_time")
          .write.mode("append").json(srcDir)
      def drain(): Unit = {
        val in = spark.readStream.schema(schema).json(srcDir)
          .withWatermark("event_time", "5 seconds")
        val q = StreamingIngest.sessionCloses(in, gapMs = 30000L)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClosedSession], _: Long) =>
            batch.toDF().write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def closed(): Seq[ClosedSession] =
        try spark.read.parquet(outDir).as[ClosedSession].collect().toSeq
        catch { case _: Throwable => Seq.empty } // outDir empty until first emit

      // t0 = 10:00:00; gap 30 s; watermark delay 5 s. AvailableNow runs
      // follow-up micro-batches until quiescent, so the watermark from a
      // drain's own data already drives that drain's timers.
      writeEvents(("A", "2026-01-01 10:00:00"), ("A", "2026-01-01 10:00:10"),
        ("B", "2026-01-01 10:00:05"))
      drain() // watermark reaches 10:00:05 — below every expiry
      assert(closed().isEmpty, "closed before the watermark passed any expiry")

      // B stays active → its timer must SLIDE to 10:02:30 (not fire at
      // 10:00:35); the same drain's watermark (10:01:55) passes A's
      // expiry 10:00:40 → A closes, B survives
      writeEvents(("B", "2026-01-01 10:02:00"))
      drain()
      val afterSecond = closed()
      assert(afterSecond.map(_.user) == Seq("A"), s"expected only A closed: $afterSecond")
      val a = afterSecond.head
      assert(a.n_events == 2 && a.start_ms < a.end_ms, s"A's session wrong: $a")

      writeEvents(("C", "2026-01-01 10:10:00"))
      drain() // watermark 10:09:55 > B's slid expiry 10:02:30 → B closes ONCE, C stays open
      val users = closed().map(_.user).sorted
      assert(users == Seq("A", "B"), s"expected A and B closed exactly once: $users")
      val b = closed().find(_.user == "B").get
      assert(b.n_events == 2, s"B's slid session must span both its events: $b")
      assert(b.end_ms - b.start_ms == 115000L, s"B spans 10:00:05→10:02:00: $b")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState ListState: last-5 orders per buyer, capped, batch-consistent") {
    val bronzeDir = tmp("bronze7")
    val outDir = tmp("recent")
    val ckpt = tmp("ckpt7")
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def drain(): Unit = {
        val q = StreamingIngest.buyerRecentOrders(
          StreamingIngest.cleanseStream(
            StreamingIngest.readBronzeStream(spark, bronzeDir, Schemas.joorRaw), "joor_orders"))
          .toDF("buyer", "recent")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            batch.withColumn("batch_id", lit(bid))
              .write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      writeBronzeBatch(bronzeDir, GenSpec(joor = 300))
      drain()
      writeBronzeBatch(bronzeDir, GenSpec(joor = 300, seed = 99))
      drain()

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"buyer").orderBy($"batch_id".desc)
      val latest = spark.read.parquet(outDir)
        .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"buyer", $"recent").as[(String, Seq[String])].collect().toMap
      // cap respected everywhere
      assert(latest.values.forall(_.size <= 5))
      assert(latest.values.exists(_.size == 5), "no buyer ever hit the cap — test data too thin")
      // membership: each kept id really belongs to that buyer's full history
      val history = Cleanse.joor(Cleanse.flatten(
        spark.read.schema(Schemas.bronzeEnvelope(Schemas.joorRaw)).json(bronzeDir)))
        .select($"buyer", $"order_id").as[(String, String)].collect()
        .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).toSet }
      latest.foreach { case (b, kept) =>
        assert(kept.toSet.subsetOf(history(b)), s"buyer $b kept unknown ids")
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session_window aggregation agrees with the w4 window-composition sessionizer") {
    // the built-in session_window (gap merge) and the lag→flag→running-sum
    // composition must carve identical sessions: same count per user, same
    // total, on the real events table
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.eventsWithTime(spark, dir)
    val builtIn = ev
      .groupBy($"user_id", session_window($"event_time", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    val composed = graft.queries.AdvancedOps.sessionize.run(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    val diff = builtIn.as("a").join(composed.as("b"), Seq("user_id"), "full")
      .filter($"a.n_sessions" =!= $"b.n_sessions" || $"a.n_events" =!= $"b.n_events"
        || $"a.n_sessions".isNull || $"b.n_sessions".isNull)
    assert(diff.count() == 0, diff.collect().take(5).mkString("\n"))
  }

  test("kafka wire decode: binary value rows → bronze envelope → silver") {
    // no broker in-container, so exercise the decode half on hand-built
    // rows carrying Kafka's exact wire schema: binary key/value plus
    // topic/partition/offset/timestamp/timestampType
    val envelopeJson = (oid: String, price: String, offset: Long) =>
      s"""{"raw_api_data":{"order_id":"$oid","buyer":"Acme","quantity":3,
         |"price":"$price","currency":"USD","payment":"stripe","country":"US",
         |"sku":"JOR-1001","product":"Coat","date":"2025-05-01T10:00:00"},
         |"kafka_metadata":{"topic":"raw_joor_orders","partition":0,
         |"offset":$offset,"stream_timestamp":"2025-05-01T10:00:01",
         |"bronze_timestamp":"2025-05-01T10:00:01.123456"}}""".stripMargin.replace("\n", "")
    val wire = Seq(
      ("k1".getBytes, envelopeJson("J-1", "100.50", 0L).getBytes, "raw_joor_orders", 0, 0L,
        java.sql.Timestamp.valueOf("2025-05-01 10:00:01"), 0),
      ("k2".getBytes, envelopeJson("J-2", "7.25", 1L).getBytes, "raw_joor_orders", 0, 1L,
        java.sql.Timestamp.valueOf("2025-05-01 10:00:02"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

    val envelope = StreamingIngest.decodeKafkaEnvelope(wire, Schemas.joorRaw)
    assert(envelope.schema.fieldNames.toSeq == Seq("raw_api_data", "kafka_metadata"))
    val metas = envelope.select($"kafka_metadata.offset", $"kafka_metadata.topic")
      .as[(Long, String)].collect().toSet
    assert(metas == Set((0L, "raw_joor_orders"), (1L, "raw_joor_orders")))

    // and the decoded envelope flows through the joor cleanse unchanged —
    // the full Kafka→silver projection, minus only the connector itself
    val silver = StreamingIngest.cleanseStream(envelope, "joor_orders")
    val rows = silver.select($"order_id", $"price", $"quantity", $"sku")
      .as[(String, Double, Int, String)].collect().toSet
    assert(rows == Set(("J-1", 100.50, 3, "JOR-1001"), ("J-2", 7.25, 3, "JOR-1001")))

    // malformed value bytes must not kill the stream: from_json yields a
    // null envelope row (to be routed to a dead-letter sink), not a crash
    val junk = Seq((Array[Byte](1, 2), "not json".getBytes, "raw_joor_orders", 0, 9L,
      java.sql.Timestamp.valueOf("2025-05-01 10:00:03"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val decoded = StreamingIngest.decodeKafkaEnvelope(junk, Schemas.joorRaw)
    assert(decoded.count() == 1 && decoded.filter($"raw_api_data".isNull).count() == 1)
  }

  test("dead-letter routing: bad value bytes split off with replay coordinates") {
    val good =
      """{"raw_api_data":{"order_id":"J-9","buyer":"B","quantity":1,"price":"5.00",
        |"currency":"USD","payment":"stripe","country":"US","sku":"JOR-1","product":"P",
        |"date":"2025-05-01T10:00:00"},"kafka_metadata":{"topic":"raw_joor_orders",
        |"partition":0,"offset":7,"stream_timestamp":"2025-05-01T10:00:01",
        |"bronze_timestamp":"2025-05-01T10:00:01.000001"}}""".stripMargin.replace("\n", "")
    val wire = Seq(
      ("k".getBytes, good.getBytes, "raw_joor_orders", 0, 7L,
        java.sql.Timestamp.valueOf("2025-05-01 10:00:01"), 0),
      ("k".getBytes, "garbage{{{".getBytes, "raw_joor_orders", 1, 42L,
        java.sql.Timestamp.valueOf("2025-05-01 10:00:02"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

    val (valid, dead) = StreamingIngest.decodeKafkaEnvelopeWithDlq(wire, Schemas.joorRaw)
    assert(valid.count() == 1)
    assert(valid.select($"raw_api_data.order_id").as[String].head() == "J-9")
    val d = dead.select($"topic", $"partition", $"offset", $"raw_value")
      .as[(String, Int, Long, Array[Byte])].collect()
    assert(d.length == 1)
    assert(d.head._3 == 42L) // replay coordinate preserved
    assert(new String(d.head._4) == "garbage{{{") // raw bytes preserved
  }

  test("kafka wire fixtures on disk: sink→source round-trip, per-partition offset order") {
    // No broker in-container, so pin the S7/S8 OFFSET SEMANTICS through
    // on-disk fixtures carrying Kafka's exact wire schema: the producer
    // half (S8 value encoding) writes what a broker would store per
    // (topic, partition, offset), rows land in the fixture INTERLEAVED
    // across partitions like a real multi-partition consumer poll, and
    // the consumer half (S7 decode) must recover every field and rebuild
    // per-partition order from the offsets alone.
    val fixtureDir = tmp("wire-fixture")
    val envelope = DataGen.bronzeJoor(spark, GenSpec(joor = 30), cfg)

    // S8 producer half: the value bytes are exactly what kafkaSinkPlan's
    // projection (toKafkaValue: to_json(struct(*))) would hand the broker
    assert(StreamingIngest.toKafkaValue(envelope).first.getString(0) ==
      envelope.select(to_json(struct(col("raw_api_data"), col("kafka_metadata"))))
        .first.getString(0))
    val wireOut = envelope.select(
      col("raw_api_data.order_id").cast("binary").as("key"),
      to_json(struct(col("raw_api_data"), col("kafka_metadata"))).cast("binary").as("value"),
      col("kafka_metadata.topic").as("topic"),
      col("kafka_metadata.partition").as("partition"),
      col("kafka_metadata.offset").as("offset"),
      to_timestamp(col("kafka_metadata.stream_timestamp")).as("timestamp"),
      lit(0).as("timestampType"))
    // interleave arrival order across partitions (md5 shuffle), one file:
    // consumers see no global order — only per-partition offset order
    wireOut.orderBy(md5(col("offset").cast("string")))
      .coalesce(1).write.mode("overwrite").parquet(fixtureDir)

    val wire = spark.read.parquet(fixtureDir)
    val decoded = StreamingIngest.decodeKafkaEnvelope(wire, Schemas.joorRaw)
    assert(decoded.count() == 30)

    // every payload field survives the produce→store→consume round trip
    val orig = envelope.select(col("raw_api_data.order_id").as("oid"),
      col("raw_api_data.price").as("p"), col("raw_api_data.quantity").as("q"),
      col("kafka_metadata.offset").as("off"))
    val back = decoded.select(col("raw_api_data.order_id").as("oid"),
      col("raw_api_data.price").as("bp"), col("raw_api_data.quantity").as("bq"),
      col("kafka_metadata.offset").as("boff"))
    val mismatch = orig.join(back, "oid")
      .filter(col("p") =!= col("bp") || col("q") =!= col("bq") || col("off") =!= col("boff"))
    assert(mismatch.count() == 0, mismatch.collect().take(3).mkString("\n"))

    // wire coordinates must agree with the envelope's own metadata —
    // partition/offset carried next to the value bytes, not inside them
    val coordDrift = wire
      .select(col("partition"), col("offset"),
        from_json(col("value").cast("string"),
          Schemas.bronzeEnvelope(Schemas.joorRaw)).as("e"))
      .filter(col("e.kafka_metadata.partition") =!= col("partition") ||
        col("e.kafka_metadata.offset") =!= col("offset"))
    assert(coordDrift.count() == 0)

    // per-partition order: within each partition the offsets sorted
    // ascending are strictly increasing and hold exactly the rows whose
    // offset ≡ partition (mod 3) — the consumer can always re-establish
    // partition order from offsets after interleaved arrival
    // collect in ARRIVAL (file) order, then verify order is recoverable:
    // arrival must actually be interleaved (or the test is vacuous) while
    // sorting each partition's offsets reconstructs the exact gap-free
    // sequence the producer wrote
    val arrival = wire.select(col("partition"), col("offset"))
      .as[(Int, Long)].collect().toSeq
    assert(arrival.map(_._2) != arrival.map(_._2).sorted,
      "fixture arrived fully ordered — the interleave this test exists for is gone")
    val perPart = arrival.groupBy(_._1).view.mapValues(_.map(_._2))
    assert(perPart.keys.toSet == Set(0, 1, 2))
    perPart.foreach { case (p, offs) =>
      assert(offs.distinct == offs, s"partition $p delivered duplicate offsets")
      assert(offs.forall(_ % 3 == p), s"partition $p holds foreign offsets")
      assert(offs.sorted == (0L until 30L).filter(_ % 3 == p),
        s"partition $p cannot rebuild its gap-free offset order")
    }
  }

  test("kafka plan construction (connector-dependent)") {
    // this container ships no spark-sql-kafka jar; with the connector the
    // plan must build with the envelope schema, without it the failure is
    // the connector lookup, not our plan
    try {
      val plan = StreamingIngest.kafkaBronzePlan(
        spark, "broker:9092", Schemas.topics("joor_orders"), Schemas.joorRaw)
      assert(plan.isStreaming)
      assert(plan.schema.fieldNames.toSeq == Seq("raw_api_data", "kafka_metadata"))
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        assert(e.getMessage.contains("kafka"))
    }
  }
}
