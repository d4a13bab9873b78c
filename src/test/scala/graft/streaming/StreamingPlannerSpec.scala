package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** StreamingPlanner — live range-boundary maintenance. Contracts:
  *  - the maintained boundaries EQUAL the batch z2 planner
  *    (`ScaleOps.plannerBounds`) over the full ingested history, for any
  *    batch split and order (the bottom-k decomposition again);
  *  - replaying a mid-stream batch is byte-stable;
  *  - as-of returns the boundaries a stream prefix would have planned;
  *  - the real sink wires the same merge end-to-end.
  */
class StreamingPlannerSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private lazy val li = Tables.lineitem(spark, sfDir).cache()

  // the shared-session CacheManager matches by logical plan, so leaving
  // this cached would make EVERY later lineitem scan (PlanSpec's
  // pushdown assertions included) read an InMemoryRelation — unpersist
  // on suite exit
  override def afterAll(): Unit = {
    li.unpersist()
    super.afterAll()
  }

  private def scoredSlice(i: Int, of: Int): DataFrame =
    StreamingPlanner.scored(li.filter($"l_orderkey" % of === i),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      Seq($"l_orderkey".cast("string"), $"l_linenumber".cast("string")))

  test("maintained boundaries == the batch z2 planner over the full table, any order") {
    val want = graft.queries.ScaleOps.plannerBounds(spark, sfDir)
    val d1 = tmp("planner-a")
    (0 until 3).foreach(i =>
      StreamingPlanner.processBatch(spark, scoredSlice(i, 3), i.toLong, d1))
    assert(StreamingPlanner.boundaries(spark, d1) == want)

    val d2 = tmp("planner-b")
    Seq(2, 0, 1).zipWithIndex.foreach { case (s, b) =>
      StreamingPlanner.processBatch(spark, scoredSlice(s, 3), b.toLong, d2)
    }
    assert(StreamingPlanner.boundaries(spark, d2) == want)
  }

  test("mid-stream replay is byte-stable; as-of plans the prefix; vacuum keeps the latest") {
    val dir = tmp("planner-replay")
    (0 until 3).foreach(i =>
      StreamingPlanner.processBatch(spark, scoredSlice(i, 3), i.toLong, dir))
    val live = StreamingPlanner.boundaries(spark, dir)
    val snap1 = spark.read.parquet(s"$dir/batch_id=1")
      .collect().map(_.mkString("|")).sorted.toSeq
    StreamingPlanner.processBatch(spark, scoredSlice(1, 3), 1L, dir) // replay
    assert(spark.read.parquet(s"$dir/batch_id=1")
      .collect().map(_.mkString("|")).sorted.toSeq == snap1)
    assert(StreamingPlanner.boundaries(spark, dir) == live)

    // as-of batch 0 = the plan over slice 0 alone
    val d0 = tmp("planner-prefix")
    StreamingPlanner.processBatch(spark, scoredSlice(0, 3), 0L, d0)
    assert(StreamingPlanner.boundariesAsOf(spark, dir, 0L) ==
      StreamingPlanner.boundaries(spark, d0))

    assert(StreamingPlanner.vacuum(spark, dir, keepFrom = 99L) == 2)
    assert(StreamingPlanner.boundaries(spark, dir) == live)
  }

  test("duplicate rows are one sample vote: a double-fed stream plans the batch boundaries") {
    // the synthetic lineitem does not honor the (orderkey, linenumber) PK,
    // and at-least-once delivery can repeat whole rows — both faces share
    // ONE sample rule (distinct (h, cents) before the bottom-k), so
    // feeding every row twice must not move a boundary, and the
    // maintained result still equals the batch planner over the history
    val want = graft.queries.ScaleOps.plannerBounds(spark, sfDir)
    val dir = tmp("planner-dup")
    (0 until 3).foreach { i =>
      val s = scoredSlice(i, 3)
      StreamingPlanner.processBatch(spark, s.unionAll(s), i.toLong, dir)
    }
    assert(StreamingPlanner.boundaries(spark, dir) == want)
  }

  test("real sink: file-source stream plans the same boundaries") {
    val src = tmp("planner-src"); val dir = tmp("planner-sink"); val ck = tmp("planner-ck")
    li.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(li.schema).parquet(src)
    StreamingPlanner.sink(stream,
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      Seq(col("l_orderkey").cast("string"), col("l_linenumber").cast("string")),
      dir, ck).start().awaitTermination()
    assert(StreamingPlanner.boundaries(spark, dir) ==
      graft.queries.ScaleOps.plannerBounds(spark, sfDir))
  }
}
