package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Split-at-admission gates: the streamed assignment must equal the
  * one-shot recompute on bridge-free corpora (arrival-monotone ids),
  * bridges flag `split_conflict` with first-assignment-wins stability,
  * labels never rewrite history, and replay converges.
  */
class StreamingSplitSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def sentence(seed: Int): String =
    (0 until 10).map(i => s"s${seed}w$i").mkString(" ")
  private def mutate(s: String): String = {
    val w = s.split(" "); w(9) = "zzz"; w.mkString(" ")
  }

  private def labels(dir: String): Map[Long, (Long, String, Boolean)] =
    spark.read.parquet(dir)
      .select($"doc_id", $"root_id", $"split", $"split_conflict")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap

  test("stream assignment equals the one-shot recompute (arrival-monotone, bridge-free)") {
    val corpus = Seq(
      (0L, sentence(1)), (1L, sentence(2)), (2L, sentence(3)),
      (3L, mutate(sentence(1))), (4L, sentence(4)),
      (10L, mutate(sentence(2))), (11L, mutate(sentence(4))), (12L, sentence(5)))
    val batches = Seq(corpus.take(3), corpus.slice(3, 5), corpus.drop(5))

    // streamed: three micro-batches through the real sink
    val srcDir = tmp("sp-src")
    val s1 = tmp("sp-stream")
    def run(): Unit = {
      val q = StreamingSplit.sink(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id bigint, text string"))
          .json(srcDir),
        s"$s1/index", s"$s1/labels", s"$s1/verdicts", s"$s1/ckpt").start()
      q.awaitTermination()
    }
    batches.foreach { b =>
      b.toDF("doc_id", "text").write.mode("append").json(srcDir)
      run()
    }

    // one-shot: the whole corpus in a single batch, fresh dirs
    val s2 = tmp("sp-oneshot")
    val (_, pairs) = StreamingNearDup.screenBatchWithPairs(
      corpus.toDF("doc_id", "text"), s"$s2/index", 0L)
    StreamingSplit.assignBatch(
      corpus.toDF("doc_id", "text"), pairs, s"$s2/labels", 0L)

    val streamed = labels(s"$s1/labels")
    val oneShot = labels(s"$s2/labels")
    assert(streamed == oneShot, s"stream $streamed\n!= one-shot $oneShot")
    assert(streamed.values.forall(!_._3), "bridge-free corpus must flag nothing")
    // near-dups share their antecedent's root; the verdict table agrees
    assert(streamed(3L)._1 == 0L && streamed(10L)._1 == 1L && streamed(11L)._1 == 4L)
    val verdictSplits = spark.read.parquet(s"$s1/verdicts")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(verdictSplits == streamed.map { case (d, (_, s, _)) => d -> s })
  }

  test("bridging two assigned components flags split_conflict; history labels stay put") {
    val dir = tmp("sp-bridge")
    // seed ids chosen for their md5 splits: 0 -> train, 3 -> val
    val b0 = Seq((0L, "a"), (3L, "b")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long, Double)]
      .toDF("doc_a", "doc_b", "est_jaccard")
    val l0 = StreamingSplit.assignBatch(b0, empty, s"$dir/labels", 0L)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(l0(0L) == (("train", false)) && l0(3L) == (("val", false)),
      s"fixture ids must land in different splits: $l0")

    // doc 5 matches members of BOTH components — the bridge
    val b1 = Seq((5L, "ab")).toDF("doc_id", "text")
    val bridge = Seq((5L, 0L, 0.9), (5L, 3L, 0.9))
      .toDF("doc_a", "doc_b", "est_jaccard")
    val l1 = StreamingSplit.assignBatch(b1, bridge, s"$dir/labels", 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    // first-assignment-wins: the smaller stored root (and ITS split) win,
    // and the conflict is flagged for quarantine
    assert(l1(5L) == ((0L, "train", true)), s"bridge verdict: $l1")

    // history labels are untouched (released data is never re-split)
    val after = labels(s"$dir/labels")
    assert(after(0L) == ((0L, "train", false)) && after(3L) == ((3L, "val", false)))
    assert(after(5L) == ((0L, "train", true)))
  }

  test("replay of a batch converges to identical labels") {
    val dir = tmp("sp-replay")
    val b0 = Seq((0L, sentence(1)), (1L, sentence(2))).toDF("doc_id", "text")
    val b1 = Seq((7L, mutate(sentence(1)))).toDF("doc_id", "text")
    def screen(df: org.apache.spark.sql.DataFrame, id: Long) = {
      val (_, p) = StreamingNearDup.screenBatchWithPairs(df, s"$dir/index", id)
      StreamingSplit.assignBatch(df, p, s"$dir/labels", id)
    }
    screen(b0, 0L)
    screen(b1, 1L)
    val first = labels(s"$dir/labels")
    screen(b1, 1L) // replay
    val second = labels(s"$dir/labels")
    assert(first == second && second(7L) == ((0L, first(0L)._2, false)))
  }
}
