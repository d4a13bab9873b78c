package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Source/sink format matrix beyond the engine's parquet default: ORC
  * (the other columnar format Spark ships built-in), CSV with explicit
  * schema + header, and JSON lines — each must round-trip the lineitem
  * slice byte-identically under a PINNED schema (schema inference is a
  * full extra pass at 100 TB; every reader here pins, as `Tables` does).
  * Also pins the two properties that matter at scale: ORC gets predicate
  * pushdown like parquet, and CSV/JSON do NOT prune columns at the scan
  * (the reason the engine's storage decision is columnar).
  */
class FormatsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  private lazy val slice = graft.Tables.lineitem(spark, sfDir)
    .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag", $"l_shipdate")
    .limit(500)
    .cache()

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = slice.collect().map(_.toSeq).toSet
    val b = df.collect().map(_.toSeq).toSet
    assert(a == b, "round-trip changed the rows")
    assert(df.schema == slice.schema, s"schema drift: ${df.schema} vs ${slice.schema}")
  }

  test("ORC round-trips with pinned schema and pushes predicates") {
    val dir = tmp("fmt-orc")
    slice.write.orc(dir)
    val back = spark.read.schema(slice.schema).orc(dir)
    assertSame(back)
    val p = back.filter($"l_returnflag" === "R").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters:") && p.contains("l_returnflag"), p)
  }

  test("CSV round-trips with pinned schema (header, timestamp format preserved)") {
    val dir = tmp("fmt-csv")
    slice.write.option("header", "true").csv(dir)
    val back = spark.read.schema(slice.schema).option("header", "true").csv(dir)
    assertSame(back)
  }

  test("JSON lines round-trip with pinned schema") {
    val dir = tmp("fmt-json")
    slice.write.json(dir)
    val back = spark.read.schema(slice.schema).json(dir)
    assertSame(back)
  }

  test("malformed CSV rows route to the corrupt-record column, not an abort") {
    val dir = tmp("fmt-bad")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      "1,1,5.0,R,2026-01-01 00:00:00\nnot,a,valid,row,at,all,extra\n2,1,3.0,A,2026-01-02 00:00:00\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, " +
        "l_returnflag STRING, l_shipdate TIMESTAMP, _corrupt_record STRING")
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(df.filter($"_corrupt_record".isNull).count() == 2)
      assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    } finally df.unpersist()
  }
}
