package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Streaming decontamination gates: verdicts must equal a batch d6-style
  * recompute over the same docs, every input doc gets a verdict row,
  * replay is idempotent, and the bloom pre-filter is in the plan.
  */
class StreamingDecontamSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // ≥8-word sentences from disjoint per-seed vocabularies, so the only
  // shared 8-grams are the engineered ones
  private def sentence(seed: Int): String =
    (0 until 12).map(i => s"s${seed}w$i").mkString(" ")

  private val evalDocs = Seq(
    (900L, sentence(1)), (901L, sentence(2))
  ).toDF("doc_id", "text")

  test("stream verdicts equal a batch recompute; every doc gets a row") {
    val screen = StreamingDecontam.prepare(evalDocs)
    val srcDir = tmp("dc-src")
    val verdictDir = tmp("dc-verdicts") + "/v"
    val ckpt = tmp("dc-ckpt")

    // batch 1: one clean doc, one verbatim eval copy, one doc too short
    // to produce any 8-gram, one doc embedding an eval doc's text
    Seq(
      (0L, sentence(10)), (1L, sentence(1)), (2L, "too short"),
      (3L, sentence(11) + " " + sentence(2))
    ).toDF("doc_id", "text").write.mode("append").json(srcDir)
    val q = StreamingDecontam.sink(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id bigint, text string"))
        .json(srcDir),
      screen, verdictDir, ckpt).start()
    q.awaitTermination()

    val v = spark.read.parquet(verdictDir)
      .select($"doc_id", $"is_contaminated", $"n_shared_ngrams")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(v.keySet == Set(0L, 1L, 2L, 3L), s"missing verdict rows: $v")
    assert(v(0L) == ((false, 0L)) && v(2L) == ((false, 0L)))
    assert(v(1L)._1 && v(3L)._1, s"contaminated docs not flagged: $v")
    // exact shared-gram counts ≡ batch recompute (d6 shape)
    val all = Seq(
      (0L, sentence(10)), (1L, sentence(1)), (2L, "too short"),
      (3L, sentence(11) + " " + sentence(2))
    ).toDF("doc_id", "text")
    val evalG = graft.queries.Ngrams.postings(evalDocs, 8, distinct = true, "g")
      .select($"g").distinct()
    val expected = graft.queries.Ngrams.postings(all, 8, distinct = true, "g")
      .join(evalG, "g").groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    v.foreach { case (id, (_, n)) =>
      assert(n == expected.getOrElse(id, 0L), s"doc $id: streamed n=$n vs batch ${expected.get(id)}")
    }

    // replay idempotence: screening the same rows again (same content)
    // leaves identical verdicts — screenBatch is stateless and the sink
    // overwrites per-__batch
    val again = StreamingDecontam.screenBatch(all, screen)
      .select($"doc_id", $"is_contaminated").as[(Long, Boolean)].collect().toMap
    assert(again == v.map { case (k, (c, _)) => k -> c })
  }

  test("bloom pre-filter is in the plan and the join stays an equi-join") {
    val screen = StreamingDecontam.prepare(evalDocs)
    val batch = Seq((0L, sentence(20)), (1L, sentence(1))).toDF("doc_id", "text")
    val p = StreamingDecontam.screenBatch(batch, screen)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("bloom_might_contain") || p.contains("might_contain"),
      s"bloom pre-filter missing from the plan:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decontamination screen degenerated to a cartesian:\n${p.take(1500)}")
  }
}
