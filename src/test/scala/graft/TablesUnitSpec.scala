package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The events.ts physical-unit contract (Tables.events).
  *
  * The driver has regenerated /root/testdata once already with a different
  * ts layout (int64 epoch-ns → timestamp[us]); a pinned LongType schema
  * reinterpreted the new values 1000× off with no error and silently broke
  * seven oracle queries (r6). The loader now sniffs the parquet footer and
  * normalizes to one contract — `ts: TimestampType` — whatever the layout;
  * this spec feeds the SAME logical rows through both supported layouts
  * and demands identical query results, and demands a LOUD failure for
  * any layout the loader does not recognize.
  */
class TablesUnitSpec extends AnyFunSuite with SparkTestKit {

  /** (event_id, epoch-µs, user_id, type, value, props) logical fixture. */
  private val rows = Seq(
    (1L, 1706140800000000L, 10L, "view", 1.5, """{"k":1}"""),
    (2L, 1706140800000001L, 10L, "click", 2.5, """{"k":2}"""),
    (3L, 1706227200000000L, 11L, "purchase", 99.0, """{"k":3}"""),
    (4L, 1706313600500000L, 11L, "error", 0.0, """{"k":4}"""))

  private def writeMicros(dir: String): Unit = {
    val df = spark.createDataFrame(rows.map { case (id, us, u, t, v, p) =>
      (id, Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L)), u, t, v, p)
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeNanosLong(dir: String): Unit = {
    val df = spark.createDataFrame(rows.map { case (id, us, u, t, v, p) =>
      (id, us * 1000L, u, t, v, p) // epoch-ns int64, the legacy layout
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeStringTs(dir: String): Unit = {
    val df = spark.createDataFrame(rows.map { case (id, us, u, t, v, p) =>
      (id, us.toString, u, t, v, p)
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def canonical(df: DataFrame): Seq[String] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect().map(_.toString).sorted.toSeq

  test("µs-timestamp and int64-ns layouts load to identical contract results") {
    val us = Files.createTempDirectory("graft-ts-us").toString
    val ns = Files.createTempDirectory("graft-ts-ns").toString
    writeMicros(us)
    writeNanosLong(ns)

    val a = Tables.events(spark, us)
    val b = Tables.events(spark, ns)
    // the contract schema (names + types; nullability varies by fixture
    // writer) is identical regardless of physical layout
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(a.schema) == shape(Tables.events), a.schema.treeString)
    assert(shape(b.schema) == shape(Tables.events), b.schema.treeString)
    // and so are the values, down to the microsecond
    assert(canonical(a) == canonical(b))
    // spot-pin one value against the raw fixture (guards double-conversion)
    assert(canonical(a).exists(_.contains("1706313600500000")))
  }

  test("a downstream µs query agrees across layouts") {
    val us = Files.createTempDirectory("graft-tsq-us").toString
    val ns = Files.createTempDirectory("graft-tsq-ns").toString
    writeMicros(us)
    writeNanosLong(ns)
    def watermarks(dir: String) =
      Tables.events(spark, dir)
        .agg(unix_micros(max(col("ts"))).as("hi"), unix_micros(min(col("ts"))).as("lo"))
        .collect().head
    assert(watermarks(us) == watermarks(ns))
    assert(watermarks(us).getLong(0) == 1706313600500000L)
  }

  test("an in-place layout regeneration re-sniffs instead of reusing the stale type") {
    // the exact drift the adaptive loader exists to catch, compressed into
    // one JVM: the driver regenerates events.parquet AT THE SAME PATH with
    // a different physical layout. A path-keyed sniff cache would silently
    // reuse the old type (ns read as µs, 1000× off); the cache is keyed on
    // the dir fingerprint, so the second load re-sniffs.
    val dir = Files.createTempDirectory("graft-ts-regen").toString
    writeMicros(dir)
    val first = canonical(Tables.events(spark, dir))
    writeNanosLong(dir) // in-place regeneration, different physical layout
    val second = canonical(Tables.events(spark, dir))
    assert(first == second,
      "in-place regenerated layout was reinterpreted through a stale sniff cache")
  }

  test("an unrecognized ts layout fails loudly, not silently skewed") {
    val dir = Files.createTempDirectory("graft-ts-bad").toString
    writeStringTs(dir)
    val e = intercept[IllegalStateException] {
      Tables.events(spark, dir).collect()
    }
    assert(e.getMessage.contains("unexpected physical type"), e.getMessage)
    assert(e.getMessage.contains("StringType"), e.getMessage)
  }

  test("the real driver testdata satisfies the contract") {
    // the guard the r6 regression needed: if the driver regenerates the
    // testdata with yet another layout, THIS fails with the loud message
    // instead of seven silent oracle mismatches
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("every table's physical layout is compatible with its pinned schema") {
    // the r6 lesson, generalized: a pinned schema silently REINTERPRETS a
    // changed physical layout instead of erroring. This sweep footer-sniffs
    // every driver table and demands each pinned field matches the file's
    // inferred type, modulo the intended divergences:
    //   - TimestampType pinned over naive parquet timestamps (inferred
    //     TimestampNTZ) — the UTC-session convention every oracle relies on;
    //   - events.ts — normalized by the adaptive loader, checked above.
    def compatible(pinned: DataType, inferred: DataType): Boolean =
      (pinned, inferred) match {
        case (a, b) if a == b => true
        case (TimestampType, TimestampNTZType) => true
        case _ => false
      }
    for ((name, pinnedSchema) <- Tables.schemas; if name != "events") {
      val inferred = spark.read.parquet(s"$sfDir/$name.parquet").schema
      assert(inferred.fieldNames.toSeq == pinnedSchema.fieldNames.toSeq,
        s"$name: column names/order drifted — pinned ${pinnedSchema.fieldNames.toSeq}, " +
          s"file has ${inferred.fieldNames.toSeq}")
      for ((p, i) <- pinnedSchema.fields.zip(inferred.fields))
        assert(compatible(p.dataType, i.dataType),
          s"$name.${p.name}: the driver regenerated the testdata with a new physical " +
            s"type — pinned ${p.dataType}, file has ${i.dataType}; update Tables.$name " +
            "(and re-run the oracle sweep) instead of silently reinterpreting")
    }
  }
}
