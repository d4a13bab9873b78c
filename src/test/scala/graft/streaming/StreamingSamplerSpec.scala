package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** StreamingSampler — live PPS sample maintenance. Contracts:
  *  - the maintained sample EQUALS a batch t38 rerun over the full
  *    ingested history, for any split of the docs into batches and any
  *    batch order (bottom-k decomposition is exact, not approximate);
  *  - replaying a batch rewrites its snapshot byte-identically and
  *    leaves the live sample untouched (the merge reads strictly-earlier
  *    state only);
  *  - a re-delivered doc occupies one slot;
  *  - empty batches keep the snapshot chain gapless;
  *  - as-of time travel returns the sample a prefix of the stream would
  *    have produced; vacuum never touches the latest snapshot;
  *  - the real foreachBatch sink wires the same merge end-to-end.
  */
class StreamingSamplerSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private lazy val docs = Tables.documents(spark, sfDir)
    .select($"doc_id", $"text", $"source").cache()

  // unpersist on exit — a lingering cache over a base-table projection
  // can shadow later suites' scan-plan assertions (shared session)
  override def afterAll(): Unit = {
    docs.unpersist()
    super.afterAll()
  }

  private def slice(i: Int, of: Int): DataFrame = docs.filter($"doc_id" % of === i)

  /** Independent statement of t38's selection over an arbitrary doc set:
    * the row_number window over (sel_key, doc_id).
    */
  private def expected(over: DataFrame, k: Int = StreamingSampler.defaultK): DataFrame = {
    val scored = StreamingSampler.scored(over)
    val w = Window.partitionBy($"source").orderBy($"sel_key", $"doc_id")
    scored.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select($"source", $"doc_id", $"n_tokens", $"u24", $"sel_key")
      .collect().map(_.mkString("|")).sorted.toSeq

  test("maintained sample == batch t38 over the full history, and order-independent") {
    val d1 = tmp("sampler-a")
    (0 until 3).foreach(i =>
      StreamingSampler.processBatch(spark, slice(i, 3), i.toLong, d1))
    assert(canon(StreamingSampler.sample(spark, d1)) == canon(expected(docs)))

    // reversed arrival order → identical final sample
    val d2 = tmp("sampler-b")
    Seq(2, 1, 0).zipWithIndex.foreach { case (s, b) =>
      StreamingSampler.processBatch(spark, slice(s, 3), b.toLong, d2)
    }
    assert(canon(StreamingSampler.sample(spark, d2)) == canon(expected(docs)))
  }

  test("replaying a mid-stream batch is byte-stable and leaves the live sample untouched") {
    val dir = tmp("sampler-replay")
    (0 until 3).foreach(i =>
      StreamingSampler.processBatch(spark, slice(i, 3), i.toLong, dir))
    val before1 = canon(spark.read.parquet(s"$dir/batch_id=1"))
    val beforeLive = canon(StreamingSampler.sample(spark, dir))
    StreamingSampler.processBatch(spark, slice(1, 3), 1L, dir) // replay
    assert(canon(spark.read.parquet(s"$dir/batch_id=1")) == before1)
    assert(canon(StreamingSampler.sample(spark, dir)) == beforeLive)
  }

  test("a re-delivered doc occupies one slot") {
    val dir = tmp("sampler-redeliver")
    // batch 0 = first half; batch 1 = second half PLUS the whole first
    // half re-delivered
    StreamingSampler.processBatch(spark, slice(0, 2), 0L, dir)
    StreamingSampler.processBatch(spark, slice(1, 2).unionByName(slice(0, 2)), 1L, dir)
    val s = StreamingSampler.sample(spark, dir)
    assert(canon(s) == canon(expected(docs)))
    assert(s.groupBy($"source", $"doc_id").count().filter($"count" > 1).isEmpty)
  }

  test("empty batches keep the chain gapless; as-of reads the prefix sample; vacuum keeps the latest") {
    val dir = tmp("sampler-asof")
    StreamingSampler.processBatch(spark, slice(0, 3), 0L, dir)
    StreamingSampler.processBatch(spark, docs.limit(0), 1L, dir)
    StreamingSampler.processBatch(spark, slice(1, 3), 2L, dir)
    StreamingSampler.processBatch(spark, slice(2, 3), 3L, dir)
    // empty batch 1 carried batch 0's sample forward
    assert(canon(StreamingSampler.sampleAsOf(spark, dir, 1)) ==
      canon(expected(slice(0, 3))))
    // prefix through batch 2 = docs of slices 0+1
    assert(canon(StreamingSampler.sampleAsOf(spark, dir, 2)) ==
      canon(expected(slice(0, 3).unionByName(slice(1, 3)))))
    val live = canon(StreamingSampler.sample(spark, dir))
    assert(StreamingSampler.vacuum(spark, dir, keepFrom = 3L) == 3)
    assert(canon(StreamingSampler.sample(spark, dir)) == live)
    // vacuum keeps the latest even when the horizon passes it
    assert(StreamingSampler.vacuum(spark, dir, keepFrom = 99L) == 0)
    assert(canon(StreamingSampler.sample(spark, dir)) == live)
  }

  test("real foreachBatch sink: file-source stream lands the same sample") {
    val src = tmp("sampler-src")
    val dir = tmp("sampler-sink")
    val ck = tmp("sampler-ck")
    docs.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs.schema).parquet(src)
    StreamingSampler.sink(stream, dir, ck).start().awaitTermination()
    assert(canon(StreamingSampler.sample(spark, dir)) == canon(expected(docs)))
  }
}
