package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * Explicit schemas rather than inference: at 100 TB, schema inference is a
  * full extra pass over the data (the reference pays this every cycle via
  * `spark.read.json` with no schema — `bronze_to_silver_all_sources.py:26`);
  * pinning the schema keeps the scan single-pass and the plans stable.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // Contract: `ts` is always surfaced as TimestampType (µs precision, the
  // only precision Spark timestamps carry). The physical layout on disk has
  // drifted across testdata generations (int64 epoch-ns → timestamp[us]),
  // so `events()` below sniffs the parquet footer and normalizes — any
  // OTHER physical type fails loudly instead of silently skewing units.
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Legacy physical layout: ts stored as a plain int64 of epoch-NANOS. */
  private val eventsTsLong: StructType =
    StructType(events.fields.map {
      case f if f.name == "ts" => f.copy(dataType = LongType)
      case f => f
    })

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Columnar parquet scan with a pinned schema; Catalyst pushes filters
    * and prunes columns into this scan (verify via `PushedFilters` /
    * `ReadSchema` in `.explain("formatted")`).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** Footer-sniffed `ts` physical type, keyed by (path, dir fingerprint) —
    * one footer read per path per layout per JVM, so repeated loads (Bench
    * runs 120+ queries) stay cheap, yet an in-place regeneration of
    * events.parquet with a different physical layout (the exact drift this
    * adaptive loader exists to catch) re-sniffs instead of silently
    * reusing the stale type. Superseded fingerprints of the same path are
    * evicted so the map stays one entry per path.
    */
  private val tsPhysical =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataType]()

  /** events with the `ts: TimestampType` contract, whatever the physical
    * layout. The driver has regenerated the testdata with a different ts
    * unit once already (int64 epoch-ns → timestamp[us]); a pinned schema
    * would reinterpret the raw values 1000× off WITHOUT any error, so this
    * loader sniffs the footer and either reads natively (timestamp[us]) or
    * converts (int64 epoch-ns), and throws on anything else. The sniff is
    * one footer read; the actual scan still uses an explicit schema, so
    * pushdown/pruning behave exactly as the pinned-schema loads above.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = s"$dir/events.parquet"
    val fp = graft.queries.Memo.fingerprint(spark, path)
    // drop sniffs of older layouts of this same path (in-place regen)
    tsPhysical.keySet.removeIf(k => k._1 == path && k._2 != fp)
    val phys = tsPhysical.computeIfAbsent((path, fp), { case (p, _) =>
      try spark.read.parquet(p).schema("ts").dataType
      catch {
        case e: Exception => throw new IllegalStateException(
          s"events.ts: cannot determine physical type of $p (TIMESTAMP(NANOS) " +
            "needs spark.sql.legacy.parquet.nanosAsLong=true to even load; " +
            "the expected layouts are timestamp[us] or int64 epoch-ns)", e)
      }
    })
    phys match {
      case TimestampType | TimestampNTZType =>
        // native µs timestamp — read through the pinned contract schema
        spark.read.schema(events).parquet(path)
      case LongType =>
        // legacy int64 epoch-ns; integer div (epoch-ns ≈ 1.7e18 overflows
        // double precision, so no `/`), then restore column order
        spark.read.schema(eventsTsLong).parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .select(events.fieldNames.map(col).toIndexedSeq: _*)
      case other => throw new IllegalStateException(
        s"events.ts: unexpected physical type $other in $path — expected " +
          "timestamp[us] (current driver layout) or int64 epoch-ns (legacy). " +
          "The testdata generator has changed layout again; update Tables.events.")
    }
  }

  /** events with `event_time: TimestampType` — alias of `ts` now that the
    * loader normalizes to the timestamp contract; kept for call-site
    * stability (streaming specs address `event_time`).
    */
  def eventsWithTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(spark, dir).withColumn("event_time", col("ts"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Fan a narrow scan out to the session's parallelism before CPU-heavy
    * per-row work (explodes, hashing, per-row vector math). The driver
    * testdata writes each table as ONE parquet row group, so every scan
    * is a single task regardless of core count and the whole map-side
    * stage serializes on one core (r13 measured: d12's explode ran 3
    * tasks end-to-end on local[32]). Guide §2.5 names the fix for
    * unsplittable inputs: repartition immediately after the read. Sized
    * from `defaultParallelism` — scale-adaptive, never a constant; on a
    * production layout with many input splits the same call is a cheap
    * rebalance of an already-parallel scan.
    */
  def spread(df: DataFrame): DataFrame = {
    // streaming micro-batches are already shuffled by their stateful ops;
    // a per-batch repartition would only add latency there
    if (df.isStreaming) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      // a many-split production scan is already parallel — repartitioning
      // it would be a full exchange of every scanned row (and could even
      // REDUCE parallelism); only fan out when the scan genuinely has
      // fewer partitions than the session (r14 ADVICE; guide §2.5 targets
      // unsplittable/single-split inputs specifically)
      if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
    }
  }
}
