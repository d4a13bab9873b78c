package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Write-audit-publish gate: a bad micro-batch must never reach the
  * serving table; staged data is invisible mid-flight; replays converge
  * whatever the original outcome; the audit trail records every check.
  */
class StreamingWapSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._
  import StreamingWap.Expectation

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def dirs() = {
    val root = tmp("wap")
    (s"$root/table", s"$root/quarantine", s"$root/audit")
  }

  private val expectations = Seq(
    Expectation("value_positive", $"value" > 0),
    Expectation("kind_in_domain", $"kind".isin("a", "b")),
    Expectation("id_not_null", $"id".isNotNull))

  private def goodBatch = Seq((1L, "a", 10.0), (2L, "b", 5.0))
    .toDF("id", "kind", "value")
  // two checks violated: one negative value, one out-of-domain kind
  private def badBatch = Seq((3L, "a", -1.0), (4L, "zz", 2.0), (5L, "b", 3.0))
    .toDF("id", "kind", "value")

  private def tableIds(tableDir: String): Set[Long] =
    StreamingWap.table(spark, tableDir).select($"id").as[Long].collect().toSet

  test("clean batch publishes atomically; dirty batch quarantines; audit records both") {
    val (table, quar, audit) = dirs()
    assert(StreamingWap.processBatch(goodBatch, 0L, expectations, table, quar, audit))
    assert(tableIds(table) == Set(1L, 2L))

    assert(!StreamingWap.processBatch(badBatch, 1L, expectations, table, quar, audit))
    // serving table untouched by the dirty batch
    assert(tableIds(table) == Set(1L, 2L))
    // the dirty rows are ALL in quarantine (clean rows of a dirty batch
    // travel with it — the batch is the atomic unit)
    val q = spark.read.parquet(s"$quar/batch_id=1").select($"id").as[Long].collect().toSet
    assert(q == Set(3L, 4L, 5L))

    // audit trail: per-check counts for both batches, decision column
    val a = spark.read.option("basePath", audit).parquet(audit)
      .select($"batch_id".cast("long"), $"check_name", $"n_violations", $"published")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(a(0L -> "value_positive") == ((0L, true)))
    assert(a(1L -> "value_positive") == ((1L, false)))
    assert(a(1L -> "kind_in_domain") == ((1L, false)))
    assert(a(1L -> "id_not_null") == ((0L, false)))
  }

  test("an unexpected NULL fails its check (conservative gate)") {
    val (table, quar, audit) = dirs()
    val withNull = Seq((Some(1L), "a", Some(10.0)), (Some(2L), "a", None))
      .toDF("id", "kind", "value")
    assert(!StreamingWap.processBatch(withNull, 0L, expectations, table, quar, audit))
    val a = spark.read.option("basePath", audit).parquet(audit)
      .filter($"check_name" === "value_positive")
      .select($"n_violations").as[Long].collect().toSeq
    assert(a == Seq(1L), s"NULL value must count as a violation: $a")
  }

  test("staged data is invisible to table readers until published") {
    val (table, quar, audit) = dirs()
    assert(StreamingWap.processBatch(goodBatch, 0L, expectations, table, quar, audit))
    // plant a staging dir as a crashed batch would leave it
    badBatch.write.mode("overwrite").parquet(s"$table/.staging/batch_id=9")
    assert(tableIds(table) == Set(1L, 2L),
      "dot-prefixed staging must be hidden from readers")
  }

  test("replay converges for both outcomes and clears crashed staging") {
    val (table, quar, audit) = dirs()
    assert(StreamingWap.processBatch(goodBatch, 0L, expectations, table, quar, audit))
    assert(!StreamingWap.processBatch(badBatch, 1L, expectations, table, quar, audit))

    // crash leftovers for batch 0 (stage written, publish never happened)
    goodBatch.write.mode("overwrite").parquet(s"$table/.staging/batch_id=0")

    // replay both batches
    assert(StreamingWap.processBatch(goodBatch, 0L, expectations, table, quar, audit))
    assert(!StreamingWap.processBatch(badBatch, 1L, expectations, table, quar, audit))

    assert(tableIds(table) == Set(1L, 2L), "published rows must not duplicate")
    val q = spark.read.parquet(s"$quar/batch_id=1").count()
    assert(q == 3L, s"quarantine must not duplicate: $q rows")
    val staging = new java.io.File(s"$table/.staging/batch_id=0")
    assert(!staging.exists, "replay must clear its own crashed staging")
  }

  test("the streaming sink gates end-to-end over a file source") {
    val (table, quar, audit) = dirs()
    val src = tmp("wap-src")
    goodBatch.write.mode("append").json(src)
    val q = StreamingWap.sink(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id bigint, kind string, value double"))
        .json(src),
      expectations, table, quar, audit, tmp("wap-ckpt")).start()
    q.awaitTermination()
    assert(tableIds(table) == Set(1L, 2L))
  }
}
