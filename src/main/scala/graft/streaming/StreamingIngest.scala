package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import graft.domain.{Cleanse, Schemas}

/** Structured Streaming re-expression of the reference's hand-rolled
  * micro-batch loops (SURVEY §2.8):
  *
  *  - the reference re-runs a batch job every 60 s with a file-based
  *    high-watermark checkpoint (`streaming_pipeline.ps1:8-32`,
  *    `bronze_to_silver_all_sources.py:9-17`), at-least-once, dropping
  *    any late bronze file forever;
  *  - here the same dataflow is a streaming query: source offsets +
  *    `checkpointLocation` give exactly-once file-sink semantics, the
  *    trigger reproduces the 60 s cadence (`Trigger.AvailableNow` for
  *    drain-and-stop runs), and lateness is explicit via watermark
  *    instead of silent.
  *
  * Scale notes: the bronze file source lists incrementally (maxFilesPerTrigger
  * caps micro-batch size); the cleanse is narrow so the stream never
  * shuffles until the windowed aggregate, which is watermark-bounded
  * state in the state store.
  */
/** Lifetime buyer profile carried in the state store (see
  * [[StreamingIngest.buyerProfiles]]).
  */
final case class BuyerProfile(
    buyer: String, n_orders: Long, revenue: Double,
    first_seen: String, last_seen: String)

/** State-v2 ListState processor behind [[StreamingIngest.buyerRecentOrders]]:
  * append-only writes under the cap; trim rewrites only the N kept entries.
  * NOTE: row order within a micro-batch follows the shuffle iterator, which
  * is not a stable event order — for strict recency semantics sort the
  * stream by event time upstream (or carry the timestamp and keep max-N by
  * time); the gates here are the cap and membership, not intra-batch order.
  */
class RecentOrdersProcessor(n: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, String), (String, Seq[String])] {

  import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var recent: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[String]("recent_orders",
      org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)

  override def handleInputRows(buyer: String,
      rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, Seq[String])] = {
    rows.foreach { case (_, oid) => recent.appendValue(oid) }
    val all = recent.get().toSeq
    val kept = all.takeRight(n)
    if (all.size > n) {
      recent.clear()
      kept.foreach(recent.appendValue)
    }
    Iterator.single((buyer, kept))
  }
}

/** State-v2 MapState processor behind [[StreamingIngest.buyerSkuCounts]]:
  * one (buyer → sku → count) entry per RocksDB key; only touched entries
  * are read/written per batch.
  */
class BuyerSkuCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, String), (String, String, Long)] {

  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("sku_counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(buyer: String,
      rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[(String, String, Long)] = {
    val touched = scala.collection.mutable.LinkedHashMap[String, Long]()
    rows.foreach { case (_, sku) =>
      val cur = touched.getOrElse(sku,
        if (counts.containsKey(sku)) counts.getValue(sku) else 0L)
      touched(sku) = cur + 1
    }
    touched.foreach { case (sku, n) => counts.updateValue(sku, n) }
    touched.iterator.map { case (sku, n) => (buyer, sku, n) }
  }
}

/** State-v2 processor behind [[StreamingIngest.buyerProfilesV2]]: one named
  * ValueState per buyer, same fold as the flatMapGroupsWithState variant.
  */
class BuyerProfileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Double, Int, String), BuyerProfile] {

  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var profile: ValueState[BuyerProfile] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    profile = getHandle.getValueState[BuyerProfile]("profile",
      org.apache.spark.sql.Encoders.product[BuyerProfile], TTLConfig.NONE)

  override def handleInputRows(buyer: String,
      rows: Iterator[(String, Double, Int, String)],
      timerValues: TimerValues): Iterator[BuyerProfile] = {
    val prev =
      if (profile.exists()) profile.get()
      else BuyerProfile(buyer, 0L, 0.0, null, null)
    val batch = rows.toSeq
    val next = BuyerProfile(
      buyer,
      prev.n_orders + batch.size,
      prev.revenue + batch.map(r => r._2 * r._3).sum,
      Option(prev.first_seen).getOrElse(batch.map(_._4).min),
      (Option(prev.last_seen).toSeq ++ batch.map(_._4)).max)
    profile.update(next)
    Iterator.single(next)
  }
}

final case class ClosedSession(
    user: String, n_events: Long, start_ms: Long, end_ms: Long)

/** State-v2 EVENT-TIME TIMER processor behind
  * [[StreamingIngest.sessionCloses]] — completes the state-v2 surface
  * next to the ValueState/MapState/ListState trio: sessions close when
  * the WATERMARK passes (last event + gap), not when the next event for
  * that user happens to arrive. `GroupState` could only close a session
  * on timeout-at-next-batch; a registered timer fires exactly once at
  * its event-time expiry, even for users that never appear again — the
  * semantics a sessionization sink actually needs.
  *
  * Per input batch for a key: fold the events into the running session
  * (ValueState), slide the single registered timer to (last seen + gap)
  * (delete + re-register — timers are per-timestamp, not named). When
  * the watermark crosses the expiry, [[handleExpiredTimer]] emits the
  * closed session ONCE and clears all state for the key. State and
  * timers are both RocksDB-backed at scale; memory per live user is one
  * small struct + one long.
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, (String, Long), ClosedSession] {

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var session: ValueState[ClosedSession] = _
  @transient private var timerAt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    session = getHandle.getValueState[ClosedSession]("session",
      org.apache.spark.sql.Encoders.product[ClosedSession], TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timer_at",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(user: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val times = rows.map(_._2).toSeq
    val prev =
      if (session.exists()) session.get()
      else ClosedSession(user, 0L, Long.MaxValue, Long.MinValue)
    val next = ClosedSession(user, prev.n_events + times.size,
      math.min(prev.start_ms, times.min), math.max(prev.end_ms, times.max))
    session.update(next)
    if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
    val expiry = next.end_ms + gapMs
    getHandle.registerTimer(expiry)
    timerAt.update(expiry)
    Iterator.empty
  }

  override def handleExpiredTimer(user: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    val out =
      if (session.exists()) Iterator.single(session.get()) else Iterator.empty
    session.clear()
    timerAt.clear()
    out
  }
}

object StreamingIngest {

  /** S7-shaped source: streaming scan of envelope JSON under
    * `dir/<topic>/`, schema pinned (no inference pass — the reference
    * re-infers every cycle).
    */
  def readBronzeStream(spark: SparkSession, dir: String, payload: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(Schemas.bronzeEnvelope(payload))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** The Kafka-source plan for deployments with a broker (S7 literal):
    * subscribe to the five raw topics, parse the JSON value against the
    * pinned payload schema. Not runnable in this container (no broker) —
    * the plan construction is the tested surface; the transformation after
    * `from_json` is identical to the file-source path.
    */
  def kafkaBronzePlan(spark: SparkSession, bootstrap: String, topic: String,
      payload: StructType): DataFrame =
    decodeKafkaEnvelope(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load(),
      payload)

  /** The broker-independent half of the Kafka source: decode Kafka's wire
    * columns (binary key/value + topic/partition/offset/timestamp) into the
    * bronze envelope via `from_json` against the pinned payload schema.
    * Batch/stream agnostic — unit-tested against hand-built wire rows
    * (StreamingSpec) since no connector jar/broker exists in-container;
    * with a broker, [[kafkaBronzePlan]] is exactly this over the live source.
    */
  def decodeKafkaEnvelope(kafkaWire: DataFrame, payload: StructType): DataFrame =
    kafkaWire
      .select(from_json(col("value").cast("string"),
        Schemas.bronzeEnvelope(payload)).as("envelope"))
      .select(col("envelope.raw_api_data").as("raw_api_data"),
        col("envelope.kafka_metadata").as("kafka_metadata"))

  /** [[decodeKafkaEnvelope]] with dead-letter routing: rows whose value
    * bytes fail `from_json` keep their RAW payload + wire coordinates
    * (topic/partition/offset) and split off for a replayable dead-letter
    * sink, instead of flowing on as silent nulls. At-scale this is the
    * difference between "0.01% of events vanished" and a re-drivable
    * quarantine: the DLQ row carries everything needed to reproduce.
    */
  def decodeKafkaEnvelopeWithDlq(kafkaWire: DataFrame,
      payload: StructType): (DataFrame, DataFrame) = {
    val parsed = kafkaWire.select(
      col("value"), col("topic"), col("partition"), col("offset"),
      from_json(col("value").cast("string"),
        Schemas.bronzeEnvelope(payload)).as("envelope"))
    val valid = parsed.filter(col("envelope.raw_api_data").isNotNull)
      .select(col("envelope.raw_api_data").as("raw_api_data"),
        col("envelope.kafka_metadata").as("kafka_metadata"))
    val dead = parsed.filter(col("envelope.raw_api_data").isNull)
      .select(col("topic"), col("partition"), col("offset"),
        col("value").as("raw_value"))
    (valid, dead)
  }

  /** Bronze→Silver continuous cleanse: flatten the envelope and apply the
    * per-source cleanser. The incremental filter (P2's checkpoint compare)
    * is subsumed by source offsets.
    */
  def cleanseStream(bronze: DataFrame, source: String): DataFrame = {
    val flat = bronze.select(col("raw_api_data.*"),
      col("kafka_metadata.bronze_timestamp"))
    source match {
      case "joor_orders" => Cleanse.joor(flat)
      case "shopify_orders" => Cleanse.shopify(flat)
      case "tiktok_orders" => Cleanse.tiktok(flat)
      case "freight_data" => Cleanse.freight(flat)
      case "gsheets_data" => Cleanse.gsheets(flat)
      case other => throw new IllegalArgumentException(s"unknown source: $other")
    }
  }

  /** S5-shaped silver sink: append parquet with exactly-once checkpointing
    * (replaces the reference's JDBC append + hand checkpoint,
    * `bronze_to_silver_all_sources.py:82-94`).
    */
  def silverSink(cleansed: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    cleansed
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")

  /** Streaming daily revenue per channel with an explicit lateness bound:
    * event time = parsed bronze_timestamp, 10-minute watermark (the
    * reference's implicit policy is "late ⇒ silently dropped forever";
    * here lateness inside the bound is merged, beyond it dropped — and the
    * bound is visible in the plan).
    */
  def dailyRevenue(cleansed: DataFrame, channel: String,
      lateness: String = "10 minutes"): DataFrame =
    cleansed
      .withColumn("event_time",
        to_timestamp(col("bronze_timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), "1 day").as("day"), lit(channel).as("channel_id"))
      .agg(
        sum(col("price") * col("quantity")).as("gross_revenue"),
        count(lit(1)).as("n_orders"))
      .select(date_format(col("day.start"), "yyyyMMdd").as("date_key"),
        col("channel_id"), col("gross_revenue"), col("n_orders"))

  /** Stateful dedup guard (§2.8 stretch): drop replayed order ids within
    * the watermark horizon — the guard the reference's at-least-once
    * delivery needs but lacks.
    */
  def dedupOrders(cleansed: DataFrame, lateness: String = "10 minutes"): DataFrame =
    cleansed
      .withColumn("event_time",
        to_timestamp(col("bronze_timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("order_id")

  /** Custom keyed state (the brief's `mapGroupsWithState` surface): a
    * running per-buyer lifetime-value profile maintained across
    * micro-batches — count, revenue sum, and first/last seen — state the
    * built-in windowed aggregates can't express (no window: lifetime).
    *
    * `GroupStateTimeout.NoTimeout` because the profile is permanent; a
    * real deployment with churned buyers would set a processing-time
    * timeout to bound the state store.
    */
  def buyerProfiles(cleansed: DataFrame): org.apache.spark.sql.Dataset[BuyerProfile] = {
    import cleansed.sparkSession.implicits._
    cleansed
      .selectExpr("buyer", "price", "quantity", "bronze_timestamp")
      .as[(String, Double, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BuyerProfile, BuyerProfile](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (buyer, rows, state) =>
          val prev = state.getOption.getOrElse(BuyerProfile(buyer, 0L, 0.0, null, null))
          val batch = rows.toSeq
          val next = BuyerProfile(
            buyer,
            prev.n_orders + batch.size,
            prev.revenue + batch.map(r => r._2 * r._3).sum,
            Option(prev.first_seen).getOrElse(batch.map(_._4).min),
            (Option(prev.last_seen).toSeq ++ batch.map(_._4)).max)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** The same lifetime buyer profile on Spark 4's arbitrary-state v2 API
    * (`transformWithState`): explicit named [[org.apache.spark.sql.streaming.ValueState]]
    * in the RocksDB state store instead of the single implicit
    * `GroupState` blob. v2 is the forward path — typed named state
    * (value/list/map), TTL, timers — and RocksDB puts the state on disk
    * with changelog checkpointing, so per-key state is bounded by disk,
    * not executor heap: the difference between 10⁶ and 10⁹ buyers.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (asserted equivalent to
    * [[buyerProfiles]] and to a batch recompute in StreamingSpec).
    */
  def buyerProfilesV2(cleansed: DataFrame): org.apache.spark.sql.Dataset[BuyerProfile] = {
    import cleansed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    cleansed
      .selectExpr("buyer", "price", "quantity", "bronze_timestamp")
      .as[(String, Double, Int, String)]
      .groupByKey(_._1)
      .transformWithState(new BuyerProfileProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Per-buyer per-SKU lifetime counts on state-v2 `MapState` — the
    * keyed-sub-map primitive `GroupState` could only fake with a whole
    * serialized Map value (rewriting the ENTIRE map per batch). MapState
    * stores each (buyer → sku) entry as its own RocksDB key: a batch
    * touching 2 of a buyer's 10k SKUs writes 2 entries, not 10k — the
    * state-write asymptotics that matter when keys are wide at scale.
    * Emits only the (buyer, sku, n) entries updated in the batch.
    */
  def buyerSkuCounts(cleansed: DataFrame): org.apache.spark.sql.Dataset[(String, String, Long)] = {
    import cleansed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    cleansed
      .selectExpr("buyer", "sku")
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new BuyerSkuCountProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Last-N order ids per buyer on state-v2 `ListState` — the bounded
    * recency buffer (fraud heuristics, "recent activity" features).
    * ListState appends WITHOUT reading the existing list — an O(1) write
    * per event in the common under-cap case; the trim path (clear +
    * re-append of N entries) only triggers when the cap is crossed.
    * Completes the v2 primitive trio next to [[buyerProfilesV2]]
    * (ValueState) and [[buyerSkuCounts]] (MapState).
    */
  def buyerRecentOrders(cleansed: DataFrame, n: Int = 5): org.apache.spark.sql.Dataset[(String, Seq[String])] = {
    import cleansed.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    cleansed
      .selectExpr("buyer", "order_id")
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new RecentOrdersProcessor(n), TimeMode.None(), OutputMode.Update())
  }

  /** Watermark-driven session closing on event-time TIMERS
    * ([[SessionTimeoutProcessor]]): input is a stream with a `user` column
    * and an `event_time` TIMESTAMP column that ALREADY carries a
    * watermark (`withWatermark` upstream — TimeMode.EventTime requires
    * it); output is one row per closed session, emitted when the
    * watermark passes (last event + gap).
    */
  def sessionCloses(events: DataFrame, gapMs: Long): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .selectExpr("user", "unix_millis(event_time) AS ms")
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimeoutProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream join: the freight-enrichment join (J1) with BOTH sides
    * streaming — orders and freight events arrive independently and match
    * within a bounded time window. State on both sides is bounded by the
    * watermarks plus the join's time-range condition (without the range
    * condition Spark would have to keep every order forever).
    *
    * Inner join semantics: an order row is emitted when its freight
    * arrives within [order_time, order_time + matchWindow]; unmatched
    * orders simply never emit (the batch pipeline's left-join default
    * fill covers those — this operator is the streaming fast path for
    * matched pairs).
    */
  def ordersWithFreightStream(
      orders: DataFrame, freight: DataFrame,
      lateness: String = "10 minutes",
      matchWindow: String = "30 minutes"): DataFrame = {
    val o = orders
      .withColumn("order_time",
        to_timestamp(col("bronze_timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("order_time", lateness)
      .select(col("order_id"), col("buyer"), col("price"), col("quantity"),
        col("order_time"))
    val f = freight
      .withColumn("freight_time",
        to_timestamp(col("bronze_timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .withWatermark("freight_time", lateness)
      .select(col("order_reference"), col("cost"), col("tracking_number"),
        col("freight_time"))
    o.join(f,
      col("order_id") === col("order_reference") &&
        col("freight_time") >= col("order_time") &&
        col("freight_time") <= col("order_time") + expr(s"INTERVAL $matchWindow"),
      "inner")
      .select(col("order_id"), col("buyer"), col("price"), col("quantity"),
        col("cost").as("freight_cost"), col("tracking_number"))
  }

  /** S9: bronze object-store sink — the consumer's one-JSON-object-per-
    * message, `topic/yyyy/MM/dd` date-partitioned layout
    * (`kafka_fashion_consumer.py:53-76`) as a streaming file sink:
    * `partitionBy(topic, ingest_date)` replaces the hand-built key path,
    * and the checkpoint makes it exactly-once instead of at-least-once.
    */
  def bronzeSink(envelope: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    envelope
      .withColumn("topic", col("kafka_metadata.topic"))
      .withColumn("ingest_date",
        substring(col("kafka_metadata.bronze_timestamp"), 1, 10))
      .writeStream
      .format("json")
      .partitionBy("topic", "ingest_date")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")

  /** S8: Kafka sink plan — `to_json(struct(*))` as the message value
    * (`kafka_fashion_producer.py:46-49` re-expressed). Connector-dependent
    * like [[kafkaBronzePlan]]; the value-encoding projection is the tested
    * part and is shared with any sink.
    */
  def toKafkaValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  def kafkaSinkPlan(df: DataFrame, bootstrap: String, topic: String,
      checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    toKafkaValue(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** S10: the producer's CDC-ish poll (`SELECT ... WHERE created_at >
    * NOW() - 1 minute` every 60 s, `kafka_fashion_producer.py:24-35`) —
    * whose clock-window semantics drop rows when a cycle runs late and
    * duplicate them on skew — re-expressed as a `rate` source feeding the
    * generator's row synthesis: offset-tracked, gap-free, exactly-once.
    * Each rate tick becomes one joor envelope row.
    */
  def cdcPollSource(spark: SparkSession, rowsPerSecond: Int = 10, seed: Long = 42L): DataFrame = {
    val base = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // (timestamp, value) — value is the gap-free offset
    base.select(
      struct(
        md5(concat_ws(":", lit(seed), col("value"), lit("oid"))).as("order_id"),
        concat(lit("Buyer "), pmod(col("value"), lit(97))).as("buyer"),
        (pmod(col("value"), lit(91)) + 10).cast("int").as("quantity"),
        format_string("%.2f", pmod(col("value"), lit(175)) + lit(25.0)).as("price"),
        lit("USD").as("currency"),
        lit("stripe").as("payment"),
        lit("US").as("country"),
        concat(lit("JOR-"), pmod(col("value"), lit(9000)) + 1000).as("sku"),
        lit("Generated").as("product"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("date")).as("raw_api_data"),
      struct(
        lit(graft.domain.Schemas.topics("joor_orders")).as("topic"),
        pmod(col("value"), lit(3)).cast("int").as("partition"),
        col("value").as("offset"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss").as("stream_timestamp"),
        date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("bronze_timestamp")).as("kafka_metadata"))
  }

  /** Streaming MERGE/upsert sink — maintain a keyed parquet snapshot from
    * a stream of row updates, the streaming counterpart of the batch
    * full-outer MERGE (`p12_merge_upsert`). Each micro-batch, via
    * `foreachBatch`:
    *
    *  1. collapse the batch to its LATEST row per key (`row_number` over
    *     `seqCol` desc — intra-batch duplicates resolve here);
    *  2. MERGE into the snapshot: matched keys take the update's whole
    *     row ONLY IF NEWER by `seqCol` (stale cross-batch redeliveries
    *     never regress the snapshot), unmatched source keys insert,
    *     unmatched target rows carry;
    *  3. rewrite ONLY the hash buckets the batch touched.
    *
    * The snapshot is laid out as `__bucket=<pmod(xxhash64(key), n)>`
    * partitions so step 3 is a dynamic-partition overwrite of the touched
    * buckets — at scale a batch of K keys rewrites ≤ min(K, nBuckets)
    * partitions, not the whole table (the parquet-native stand-in for a
    * row-level ACID MERGE). The merge itself is partition-pruned on the
    * same buckets, so per-batch cost is O(touched-bucket bytes), not
    * O(snapshot).
    *
    * Exactly-once: `foreachBatch` replays a batch after a crash, and the
    * merge is IDEMPOTENT (replacing a row with the same row), so the
    * snapshot converges — at-least-once execution, exactly-once effect.
    * The staged write (`.merge.stage`) keeps the overwrite's source out of
    * its own read path; a crash between stage and overwrite is healed by
    * the replay.
    */
  def upsertSink(updates: DataFrame, keyCol: String, seqCol: String,
      snapshotDir: String, checkpointDir: String, nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoSnapshot(batch, keyCol, seqCol, snapshotDir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("update")

  /** One micro-batch (or batch backfill) MERGE into the bucketed snapshot
    * — see [[upsertSink]]. Callable directly for batch upserts too.
    */
  /** Deterministic intra-batch winner per key: seq desc, then every
    * remaining column asc — equal-seq ties must resolve identically on a
    * foreachBatch REPLAY or the idempotence guarantee breaks. Null keys
    * are rejected up front (a null key has no bucket and no merge
    * identity). Shared by the merge and the CDF producer so both halves
    * pick the same row.
    */
  private[streaming] def batchWinners(batch: DataFrame, keyCol: String,
      seqCol: String): DataFrame = {
    val dataCols = batch.columns
    val ordering = col(seqCol).desc +:
      dataCols.filterNot(_ == seqCol).map(c => col(c).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ordering: _*)
    batch
      .filter(col(keyCol).isNotNull)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  def mergeIntoSnapshot(batch: DataFrame, keyCol: String, seqCol: String,
      snapshotDir: String, nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val dataCols = batch.columns
    val bucketOf = pmod(xxhash64(col(keyCol)), lit(nBuckets))
    val latest = batchWinners(batch, keyCol, seqCol).withColumn("__bucket", bucketOf)
    // an empty batch must be a no-op: a partitioned write of zero rows
    // leaves a part-less directory that poisons the next read's schema
    // inference (and would create an empty "snapshot")
    if (latest.isEmpty) return

    val path = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(snapshotDir + ".merge.stage")
    val marker = new org.apache.hadoop.fs.Path(snapshotDir, "_graft_nbuckets")
    def writeMarker(): Unit = {
      val out = fs.create(marker, true)
      out.write(nBuckets.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
    if (!fs.exists(path)) {
      latest.write.partitionBy("__bucket").mode("overwrite").parquet(snapshotDir)
      writeMarker()
      return
    }
    // the bucket count is part of the snapshot's physical identity: a
    // merge with a different nBuckets would rehash keys into OTHER
    // buckets and dynamic overwrite would leave the old copies in place —
    // silent duplicate keys. Refuse instead.
    if (fs.exists(marker)) {
      val len = fs.getFileStatus(marker).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(marker)
      in.readFully(0, buf) // a bare read() may return short on remote FSs
      in.close()
      val stored =
        new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      require(stored == nBuckets,
        s"snapshot $snapshotDir was built with nBuckets=$stored; merging with " +
          s"nBuckets=$nBuckets would scatter keys across mismatched buckets")
    } else writeMarker()

    val touched = latest.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0)) // ≤ nBuckets rows — driver-safe
    val cur = spark.read.parquet(snapshotDir)
      .filter(col("__bucket").isin(touched.toIndexedSeq: _*)) // partition-pruned
    // matched keys take the source row only if it is NEWER: at-least-once
    // delivery reorders offsets ACROSS batches too — a stale redelivery
    // (or a replay of an old batch) must never regress the snapshot. Equal
    // seq resolves by the same deterministic remaining-columns-asc rule as
    // the intra-batch winner, so replaying any past batch is a no-op.
    val sSeq = col(s"s.`$seqCol`")
    val tSeq = col(s"t.`$seqCol`")
    val restCols = dataCols.filterNot(_ == seqCol)
    val sRest = struct(restCols.map(c => col(s"s.`$c`")): _*)
    val tRest = struct(restCols.map(c => col(s"t.`$c`")): _*)
    val srcWins = col(s"s.`$keyCol`").isNotNull && (col(s"t.`$keyCol`").isNull ||
      (tSeq.isNull && sSeq.isNotNull) || sSeq > tSeq ||
      (sSeq <=> tSeq) && sRest <= tRest)
    val merged = cur.alias("t")
      .join(latest.alias("s"), col(s"t.`$keyCol`") === col(s"s.`$keyCol`"), "full_outer")
      .select(dataCols.map(c =>
        when(srcWins, col(s"s.`$c`")).otherwise(col(s"t.`$c`")).as(c)): _*)
      .withColumn("__bucket", bucketOf)

    fs.delete(stage, true)
    merged.write.partitionBy("__bucket").mode("overwrite").parquet(stage.toString)
    spark.read.parquet(stage.toString)
      .write.partitionBy("__bucket").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(snapshotDir)
    fs.delete(stage, true)
  }
}
