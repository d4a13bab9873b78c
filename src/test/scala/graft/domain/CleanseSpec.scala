package graft.domain

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** P3 cleansers on handcrafted messy rows — every coalesce branch from
  * `bronze_to_silver_all_sources.py:39-79` (FIXTURES.md A2/A3).
  */
class CleanseSpec extends AnyFunSuite with SparkTestKit {

  private def bronzeOf(payloadJson: Seq[String], payloadSchema: org.apache.spark.sql.types.StructType) = {
    import spark.implicits._
    spark.read.schema(Schemas.bronzeEnvelope(payloadSchema))
      .json(payloadJson.toDS)
  }

  test("joor cleanse: string price cast, null coalesce defaults") {
    val bronze = bronzeOf(Seq(
      """{"raw_api_data":{"order_id":"o1","buyer":"London Fashion House","quantity":12,"price":"83.4529","currency":"usd","payment":"hilldun","country":"USA","sku":"JOR-1234","product":"p","date":"2025-07-04T10:00:00Z"},"kafka_metadata":{"topic":"raw-joor-orders","partition":0,"offset":1,"stream_timestamp":"2025-07-04T10:00:00","bronze_timestamp":"2025-07-04T10:00:01.000001"}}""",
      """{"raw_api_data":{"order_id":null,"buyer":null,"quantity":null,"price":"not-a-number","currency":"$","payment":"stripe","country":"US","sku":null,"product":"p","date":"2025-07-04T10:00:00"},"kafka_metadata":{"topic":"raw-joor-orders","partition":1,"offset":2,"stream_timestamp":"2025-07-04T10:00:00","bronze_timestamp":"2025-07-04T10:00:02.000001"}}"""),
      Schemas.joorRaw)
    val out = Cleanse.toSilver(Cleanse.joor(Cleanse.flatten(bronze))).orderBy("order_id").collect()
    assert(out.length == 2)
    // null branch: everything coalesced to defaults; unparseable price → 0.0
    assert(out(0) == Row("", "", 0.0, 0, ""))
    assert(out(1) == Row("o1", "London Fashion House", 83.4529, 12, "JOR-1234"))
  }

  test("joor cleanse honors the bronze watermark (P2)") {
    val bronze = bronzeOf(Seq(
      """{"raw_api_data":{"order_id":"old","buyer":"b","quantity":1,"price":"1.0","currency":"USD","payment":"stripe","country":"US","sku":"s","product":"p","date":"d"},"kafka_metadata":{"topic":"t","partition":0,"offset":1,"stream_timestamp":"s","bronze_timestamp":"2025-07-04T09:00:00.000000"}}""",
      """{"raw_api_data":{"order_id":"new","buyer":"b","quantity":1,"price":"1.0","currency":"USD","payment":"stripe","country":"US","sku":"s","product":"p","date":"d"},"kafka_metadata":{"topic":"t","partition":0,"offset":2,"stream_timestamp":"s","bronze_timestamp":"2025-07-04T11:00:00.000000"}}"""),
      Schemas.joorRaw)
    val cleansed = Cleanse.joor(Cleanse.flatten(bronze, "2025-07-04T10:00:00.000000"))
    assert(cleansed.select("order_id").collect().map(_.getString(0)).toSeq == Seq("new"))
    // A3: the next checkpoint is the max surviving bronze_timestamp
    assert(Cleanse.nextCheckpoint(cleansed).contains("2025-07-04T11:00:00.000000"))
  }

  test("shopify cleanse: int id becomes string order_id") {
    val bronze = bronzeOf(Seq(
      """{"raw_api_data":{"id":123456,"customer":"Ava Tan","email":"a@x.com","quantity":2,"price":"59.90","country":"SG","sku":"SH-1","product":"p","payment":"paypal","status":"paid","created_at":"c"},"kafka_metadata":{"topic":"t","partition":0,"offset":1,"stream_timestamp":"s","bronze_timestamp":"b"}}"""),
      Schemas.shopifyRaw)
    val out = Cleanse.toSilver(Cleanse.shopify(Cleanse.flatten(bronze))).collect()
    assert(out(0) == Row("123456", "Ava Tan", 59.90, 2, "SH-1"))
  }

  test("tiktok cleanse: cents → dollars ÷100 (P4)") {
    val bronze = bronzeOf(Seq(
      """{"raw_api_data":{"order_id":"TT1","buyer":"Mia Lee","quantity":3,"price_cents":4550,"currency":"SGD","country":"SG","sku":"TT-1","product":"p","live_stream":true,"creator":"@mia","timestamp":1751623200},"kafka_metadata":{"topic":"t","partition":0,"offset":1,"stream_timestamp":"s","bronze_timestamp":"b"}}""",
      """{"raw_api_data":{"order_id":"TT2","buyer":"x","quantity":1,"price_cents":null,"currency":"SGD","country":"SG","sku":"TT-2","product":"p","live_stream":false,"creator":"@x","timestamp":1},"kafka_metadata":{"topic":"t","partition":0,"offset":2,"stream_timestamp":"s","bronze_timestamp":"b"}}"""),
      Schemas.tiktokRaw)
    val out = Cleanse.toSilver(Cleanse.tiktok(Cleanse.flatten(bronze))).orderBy("order_id").collect()
    assert(out(0) == Row("TT1", "Mia Lee", 45.50, 3, "TT-1"))
    assert(out(1) == Row("TT2", "x", 0.0, 1, "TT-2"))  // null cents → 0.0
  }

  test("freight + gsheets cleanse shapes") {
    val f = bronzeOf(Seq(
      """{"raw_api_data":{"tracking":"DHL1234567","cost":23.5,"currency":"USD","status":"in_transit","weight":"2.2 kg","provider":"dhl","order_ref":"ORDER-11111"},"kafka_metadata":{"topic":"t","partition":0,"offset":1,"stream_timestamp":"s","bronze_timestamp":"b"}}"""),
      Schemas.freightRaw)
    assert(Cleanse.toSilver(Cleanse.freight(Cleanse.flatten(f))).collect()(0) ==
      Row("DHL1234567", "dhl", 23.5, "ORDER-11111"))

    val g = bronzeOf(Seq(
      """{"raw_api_data":{"sheet_name":"Sales Tracker","sheet_data":[["Buyer","Commission %"],["Acme Styles","5.2%"]]},"kafka_metadata":{"topic":"t","partition":0,"offset":1,"stream_timestamp":"s","bronze_timestamp":"b"}}"""),
      Schemas.gsheetsRaw)
    val row = Cleanse.toSilver(Cleanse.gsheets(Cleanse.flatten(g))).collect()(0)
    assert(row.getString(0) == "Sales Tracker")
    assert(row.getSeq[scala.collection.Seq[String]](1).map(_.toList).toList ==
      List(List("Buyer", "Commission %"), List("Acme Styles", "5.2%")))
  }
}
