package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** STREAMING SESSIONIZATION — `session_window` run in its native habitat:
  * unbounded event streams, watermark-bounded state, sessions emitted
  * exactly once when they can no longer grow. w17 pins the operator's
  * merge rule in batch; this module is the §2.8 face: state per (user ×
  * open session), merged on arrival, FINALIZED (emitted + evicted) when
  * the watermark passes `session end`, so state is bounded by the live
  * session population regardless of stream length — the property that
  * lets sessionization run forever at 100 TB/day.
  *
  * Append output mode is load-bearing: a finalized session is emitted
  * once and never revised, which is what makes the parquet sink (and any
  * downstream incremental consumer) correct without upsert machinery.
  * The cost: events later than watermark are DROPPED (the documented
  * lateness contract — StreamingSessionizeSpec pins both the drop and
  * the in-watermark merge).
  */
object StreamingSessionize {

  /** Watermarked session aggregate over an event stream with
    * `(ts TIMESTAMP, user_id LONG, value ...)` — the streaming twin of
    * w17's batch query (same gap, same aggregate shape).
    */
  def sessions(stream: DataFrame, gap: String = "30 minutes",
      lateness: String = "1 minute"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("session_value"))

  /** Append-mode parquet sink: only watermark-finalized sessions land. */
  def sink(stream: DataFrame, outDir: String, checkpoint: String,
      gap: String = "30 minutes",
      lateness: String = "1 minute"): DataStreamWriter[org.apache.spark.sql.Row] =
    sessions(stream, gap, lateness).writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
