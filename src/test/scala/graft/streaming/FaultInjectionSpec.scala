package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** CRASH-RECOVERY fault injection for the streaming exactly-once claims
  * (r9 verdict #2). Replay idempotence was spec-pinned batch-wise; this
  * harness proves the actual failure mode those designs exist for: the
  * process dies AFTER a batch's side-effect writes land but BEFORE the
  * checkpoint commit records the batch. foreachBatch is at-least-once,
  * so on restart Structured Streaming re-executes the same offsets as
  * the SAME batchId — and the batch-scoped dynamic-overwrite layouts
  * must converge to the uninterrupted end state.
  *
  * Mechanics: the injected fault is a throw at the END of the
  * foreachBatch body — all side effects complete, then the stream dies
  * without committing. That is byte-for-byte the "crash between
  * side-effect and commit" window (the commit is written by the stream
  * engine only after foreachBatch returns). Each test then restarts
  * from the same checkpoint and compares EVERY output directory
  * row-for-row against a control run that was never interrupted.
  *
  * Three sinks, three different convergence mechanisms under test:
  *  - intake ledger/verdicts: batch-scoped overwrite + strictly-earlier
  *    ledger reads (the replay recomputes identical verdicts);
  *  - IVF index: frozen-centroid idempotent train + `__batch=N` dynamic
  *    overwrite (crash at batch 0 covers train-then-crash);
  *  - CDF: the replay sees its own rows already merged, classifies
  *    everything `noop`, and the EMPTY dynamic overwrite must leave the
  *    original feed partition intact (the subtlest case — a naive
  *    truncate-then-write feed would lose batch 1's changes forever).
  */
class FaultInjectionSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Drive `body` over the json files at `srcDir` through one
    * Trigger.AvailableNow pass; optionally crash right after `failAfter`'s
    * side effects. Returns the injected failure if it fired.
    */
  private def runPass(srcDir: String, schema: String, ckpt: String,
      failAfter: Option[Long])(body: (DataFrame, Long) => Unit): Option[Throwable] = {
    val q = spark.readStream.schema(StructType.fromDDL(schema)).json(srcDir)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        body(b, id)
        if (failAfter.contains(id))
          throw new RuntimeException(s"injected crash after batch $id side effects")
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .outputMode("update")
      .start()
    try { q.awaitTermination(); None }
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException => Some(e) }
  }

  /** Canonical row-set of an output directory (order- and file-layout-
    * independent; the contract is table content, not file bytes).
    */
  private def rowsOf(dir: String): Seq[String] =
    spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq

  // ---------------------------------------------------------------- intake

  private def sentence(seed: Int): String =
    (0 until 12).map(i => s"s${seed}w$i").mkString(" ")
  private def mutate(s: String): String = {
    val w = s.split(" "); w(w.length - 1) = "zzz"; w.mkString(" ")
  }

  test("intake sinkWithQuota: crash after batch 1's writes, restart, end state equals uninterrupted run") {
    val schema = "doc_id bigint, text string, lang string"
    // quota binds at 2 docs/lang: batch 1's admission depends on batch 0's
    // ledger — exactly the cross-batch state a replay must re-read, not re-spend
    val corpus = Seq(
      (0L, sentence(10), "en"), (1L, sentence(11), "en"), (2L, sentence(12), "de"),
      (10L, sentence(13), "en"), (11L, mutate(sentence(10)), "en"), (12L, sentence(14), "de"))
      .toDF("doc_id", "text", "lang")
    val quotaDf = StreamingAdmission.quotas(corpus, budget = 4L).cache()
    val screen = StreamingDecontam.prepare(Seq((900L, sentence(12))).toDF("doc_id", "text"))
    val b0 = corpus.filter($"doc_id" < 10L)
    val b1 = corpus.filter($"doc_id" >= 10L)

    def run(srcDir: String, ckpt: String, index: String, ledger: String,
        verd: String, failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingIntake.processBatchWithQuota(b, id, index, screen, quotaDf,
          ledger, verd)
      }

    // control: two clean passes
    val (cSrc, cCkpt) = (tmp("fi-csrc"), tmp("fi-cckpt"))
    val (cIdx, cLed, cVerd) = (tmp("fi-cidx") + "/ix", tmp("fi-cled"), tmp("fi-cverd") + "/v")
    b0.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cIdx, cLed, cVerd, None).isEmpty)
    b1.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cIdx, cLed, cVerd, None).isEmpty)

    // fault run: batch 0 clean, batch 1 crashes post-write, restart replays
    val (fSrc, fCkpt) = (tmp("fi-fsrc"), tmp("fi-fckpt"))
    val (fIdx, fLed, fVerd) = (tmp("fi-fidx") + "/ix", tmp("fi-fled"), tmp("fi-fverd") + "/v")
    b0.write.mode("append").json(fSrc)
    assert(run(fSrc, fCkpt, fIdx, fLed, fVerd, None).isEmpty)
    b1.write.mode("append").json(fSrc)
    val failure = run(fSrc, fCkpt, fIdx, fLed, fVerd, Some(1L))
    assert(failure.nonEmpty, "injected crash did not fire")
    // the side effects DID land before the crash — this is the window under test
    assert(spark.read.parquet(fVerd).filter($"__batch" === 1).count() > 0,
      "crash fired before the verdict write — wrong injection point")
    assert(run(fSrc, fCkpt, fIdx, fLed, fVerd, None).isEmpty, "restart failed")

    assert(rowsOf(fVerd) == rowsOf(cVerd), "verdicts diverged after crash-replay")
    assert(rowsOf(fLed) == rowsOf(cLed), "admission ledger diverged after crash-replay")
    // quota actually bound (otherwise the ledger dependence isn't exercised)
    val admitted = spark.read.parquet(cVerd).filter($"admitted").count()
    val clean = spark.read.parquet(cVerd).filter($"clean").count()
    assert(admitted < clean, s"quota never bound (admitted=$admitted clean=$clean)")
  }

  // ------------------------------------------------------------------- ivf

  test("StreamingIvf: crash after batch 0 trained + appended, restart, index equals uninterrupted run") {
    val schema = "vec_id bigint, embedding array<float>, label int"
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(d => ((seed * 31 + d * 7) % 13 - 6).toFloat)
    val b0 = (0L until 40L).map(i => (i, vec(i.toInt), 0)).toDF("vec_id", "embedding", "label")
    val b1 = (100L until 120L).map(i => (i, vec(i.toInt), 0)).toDF("vec_id", "embedding", "label")

    def run(srcDir: String, ckpt: String, index: String,
        failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingIvf.ingestBatch(b, index, id, trainOnFirstBatch = true, k = 4)
      }

    val (cSrc, cCkpt, cIdx) = (tmp("fi-ivf-csrc"), tmp("fi-ivf-cckpt"), tmp("fi-ivf-cidx") + "/ix")
    b0.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cIdx, None).isEmpty)
    b1.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cIdx, None).isEmpty)

    // crash at batch 0: centroids PUBLISHED and postings WRITTEN, commit lost
    val (fSrc, fCkpt, fIdx) = (tmp("fi-ivf-fsrc"), tmp("fi-ivf-fckpt"), tmp("fi-ivf-fidx") + "/ix")
    b0.write.mode("append").json(fSrc)
    val failure = run(fSrc, fCkpt, fIdx, Some(0L))
    assert(failure.nonEmpty, "injected crash did not fire")
    assert(StreamingIvf.centroids(spark, fIdx).count() > 0,
      "crash fired before the centroid publish — wrong injection point")
    assert(run(fSrc, fCkpt, fIdx, None).isEmpty, "restart failed")
    b1.write.mode("append").json(fSrc)
    assert(run(fSrc, fCkpt, fIdx, None).isEmpty)

    def postings(ix: String): Seq[String] =
      StreamingIvf.scanPostings(spark, ix).get
        .select($"vec_id", $"cell_id", $"__batch")
        .collect().map(_.toString).sorted.toSeq
    assert(postings(fIdx) == postings(cIdx), "postings diverged after crash-replay")
    assert(StreamingIvf.centroids(spark, fIdx).collect().map(_.toString).sorted.toSeq ==
      StreamingIvf.centroids(spark, cIdx).collect().map(_.toString).sorted.toSeq,
      "replayed first batch re-trained different centroids")
  }

  // ------------------------------------------------------------------- cdf

  test("StreamingCdf: crash after batch 1's feed+merge, restart, snapshot AND feed equal uninterrupted run") {
    val schema = "k bigint, v string, seq bigint"
    val b0 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)).toDF("k", "v", "seq")
    val b1 = Seq((2L, "b2", 2L), (4L, "d", 2L)).toDF("k", "v", "seq") // 1 update + 1 insert

    def run(srcDir: String, ckpt: String, snap: String, cdf: String,
        failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingCdf.processBatch(b.sparkSession, b, id, "k", "seq", snap, cdf,
          nBuckets = 4)
      }

    val (cSrc, cCkpt) = (tmp("fi-cdf-csrc"), tmp("fi-cdf-cckpt"))
    val (cSnap, cCdf) = (tmp("fi-cdf-csnap") + "/s", tmp("fi-cdf-ccdf") + "/f")
    b0.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSnap, cCdf, None).isEmpty)
    b1.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSnap, cCdf, None).isEmpty)

    val (fSrc, fCkpt) = (tmp("fi-cdf-fsrc"), tmp("fi-cdf-fckpt"))
    val (fSnap, fCdf) = (tmp("fi-cdf-fsnap") + "/s", tmp("fi-cdf-fcdf") + "/f")
    b0.write.mode("append").json(fSrc)
    assert(run(fSrc, fCkpt, fSnap, fCdf, None).isEmpty)
    b1.write.mode("append").json(fSrc)
    val failure = run(fSrc, fCkpt, fSnap, fCdf, Some(1L))
    assert(failure.nonEmpty, "injected crash did not fire")
    // both side effects landed: the feed has batch 1's rows AND the merge applied
    assert(StreamingCdf.feed(spark, fCdf).filter($"batch_id" === 1L).count() == 2L,
      "crash fired before the feed write — wrong injection point")
    assert(spark.read.parquet(fSnap).filter($"k" === 4L).count() == 1L,
      "crash fired before the merge — wrong injection point")
    assert(run(fSrc, fCkpt, fSnap, fCdf, None).isEmpty, "restart failed")

    // the replay classified everything noop against the already-merged
    // snapshot; the empty dynamic overwrite must NOT have clobbered the
    // feed partition written before the crash
    assert(rowsOf(fCdf) == rowsOf(cCdf), "change feed diverged after crash-replay")
    assert(rowsOf(fSnap) == rowsOf(cSnap), "snapshot diverged after crash-replay")
    // and time travel over the crash-replayed feed still reconstructs v0
    val v0 = StreamingCdf.asOf(spark, fSnap, fCdf, "k", 0L)
      .select($"k", $"v", $"seq").as[(Long, String, Long)].collect().toSet
    assert(v0 == Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      s"asOf(0) over the replayed feed drifted: $v0")
  }

  // ------------------------------------------------------------- tombstones

  test("StreamingTombstone: crash after a batch carrying a DELETE, restart, live view/feed/asOf converge") {
    val schema = "k bigint, v string, seq bigint, del boolean"
    val b0 = Seq((1L, "a", 1L, false), (2L, "b", 1L, false), (3L, "c", 1L, false))
      .toDF("k", "v", "seq", "del")
    // batch 1: delete + update + insert — the full branch set in the
    // crashed batch, so the replay must re-suppress all three correctly
    val b1 = Seq((1L, "a", 2L, true), (2L, "b2", 2L, false), (4L, "d", 2L, false))
      .toDF("k", "v", "seq", "del")

    def run(srcDir: String, ckpt: String, snap: String, cdf: String,
        failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingTombstone.processBatch(b.sparkSession, b, id, "k", "seq",
          "del", snap, cdf, nBuckets = 4)
      }

    val (cSrc, cCkpt) = (tmp("fi-ts-csrc"), tmp("fi-ts-cckpt"))
    val (cSnap, cCdf) = (tmp("fi-ts-csnap") + "/s", tmp("fi-ts-ccdf") + "/f")
    b0.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSnap, cCdf, None).isEmpty)
    b1.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSnap, cCdf, None).isEmpty)

    val (fSrc, fCkpt) = (tmp("fi-ts-fsrc"), tmp("fi-ts-fckpt"))
    val (fSnap, fCdf) = (tmp("fi-ts-fsnap") + "/s", tmp("fi-ts-fcdf") + "/f")
    b0.write.mode("append").json(fSrc)
    assert(run(fSrc, fCkpt, fSnap, fCdf, None).isEmpty)
    b1.write.mode("append").json(fSrc)
    val failure = run(fSrc, fCkpt, fSnap, fCdf, Some(1L))
    assert(failure.nonEmpty, "injected crash did not fire")
    // the delete DID land before the crash: tombstone row present, key gone live
    assert(spark.read.parquet(fSnap)
      .filter($"k" === 1L && $"del").count() == 1L,
      "crash fired before the merge — wrong injection point")
    assert(StreamingCdf.feed(spark, fCdf)
      .filter($"batch_id" === 1L && $"change_type" === "delete").count() == 1L,
      "crash fired before the feed write — wrong injection point")
    assert(run(fSrc, fCkpt, fSnap, fCdf, None).isEmpty, "restart failed")

    // replay against the already-merged store: the re-arriving tombstone
    // hits an already-deleted key (noop), the update/insert hit their own
    // images (noop) — feed and snapshot must equal the uninterrupted run
    assert(rowsOf(fCdf) == rowsOf(cCdf), "change feed diverged after crash-replay")
    assert(rowsOf(fSnap) == rowsOf(cSnap), "snapshot diverged after crash-replay")
    val live = StreamingTombstone.snapshot(spark, fSnap, "del")
      .select($"k", $"v", $"seq").as[(Long, String, Long)].collect().toSet
    assert(live == Set((2L, "b2", 2L), (3L, "c", 1L), (4L, "d", 2L)))
    // time travel across the crashed delete still resurrects version 0
    val v0 = StreamingTombstone.asOf(spark, fSnap, fCdf, "k", "del", 0L)
      .select($"k", $"v", $"seq").as[(Long, String, Long)].collect().toSet
    assert(v0 == Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      s"asOf(0) over the crash-replayed delete feed drifted: $v0")
  }

  // ----------------------------------------------------------------- cusum

  test("StreamingCusum: crash after an ACTIVE batch's ledger+verdict, restart, state equals uninterrupted run") {
    // the window under test: the recurrence state (s_up/smin_up/...)
    // for batch 2 is already in the ledger, the checkpoint never
    // committed — the replay must re-derive batch 2 from strictly-earlier
    // rows and land byte-identical state, and batch 3 (new data after the
    // restart) must continue the recurrence as if nothing happened
    val schema = "v bigint"
    def batchRows(i: Int): DataFrame = {
      val k = 1000L + (if (i >= 2) 80L else 0L) + (i % 7)
      Seq.tabulate(4)(j => k / 4 + (if (j == 0) k % 4 else 0L)).toDF("v")
    }
    def run(srcDir: String, ckpt: String, ledger: String, verd: String,
        failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingCusum.processBatch(b.sparkSession, b, id, "v", ledger, verd,
          refBatches = 2)
      }

    def driveAll(src: String, ckpt: String, led: String, verd: String,
        crashAt: Option[Long]): Unit = {
      (0 to 2).foreach { i =>
        batchRows(i).write.mode("append").json(src)
        val r = run(src, ckpt, led, verd, crashAt.filter(_ == i.toLong))
        if (crashAt.contains(i.toLong)) {
          assert(r.nonEmpty, "injected crash did not fire")
          // side effects landed before the crash — the window under test
          assert(spark.read.parquet(s"$led/batch_id=$i").count() == 1)
          assert(run(src, ckpt, led, verd, None).isEmpty, "restart failed")
        } else assert(r.isEmpty)
      }
      batchRows(3).write.mode("append").json(src)
      assert(run(src, ckpt, led, verd, None).isEmpty)
    }

    val (cSrc, cCkpt) = (tmp("fi-cu-csrc"), tmp("fi-cu-cckpt"))
    val (cLed, cVerd) = (tmp("fi-cu-cled"), tmp("fi-cu-cverd") + "/v")
    driveAll(cSrc, cCkpt, cLed, cVerd, crashAt = None)

    val (fSrc, fCkpt) = (tmp("fi-cu-fsrc"), tmp("fi-cu-fckpt"))
    val (fLed, fVerd) = (tmp("fi-cu-fled"), tmp("fi-cu-fverd") + "/v")
    driveAll(fSrc, fCkpt, fLed, fVerd, crashAt = Some(2L))

    assert(rowsOf(fLed) == rowsOf(cLed), "cusum ledger diverged after crash-replay")
    assert(rowsOf(fVerd) == rowsOf(cVerd), "cusum verdicts diverged after crash-replay")
  }

  // --------------------------------------------------------------- sampler

  test("StreamingSampler: crash after batch 1's snapshot landed, restart, sample equals uninterrupted run") {
    val schema = "doc_id bigint, text string, source string"
    def doc(id: Long, src: String) =
      (id, (0 until (1 + (id % 7)).toInt).map(i => s"w${id}x$i").mkString(" "), src)
    val corpus = (0L until 40L).map(id => doc(id, s"src${id % 3}"))
      .toDF("doc_id", "text", "source")
    val b0 = corpus.filter($"doc_id" < 20L)
    val b1 = corpus.filter($"doc_id" >= 20L)

    def run(srcDir: String, ckpt: String, sample: String,
        failAfter: Option[Long]): Option[Throwable] =
      runPass(srcDir, schema, ckpt, failAfter) { (b, id) =>
        StreamingSampler.processBatch(b.sparkSession, b, id, sample, k = 4)
      }

    val (cSrc, cCkpt, cSam) = (tmp("fi-sa-csrc"), tmp("fi-sa-cckpt"), tmp("fi-sa-csam") + "/s")
    b0.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSam, None).isEmpty)
    b1.write.mode("append").json(cSrc)
    assert(run(cSrc, cCkpt, cSam, None).isEmpty)

    val (fSrc, fCkpt, fSam) = (tmp("fi-sa-fsrc"), tmp("fi-sa-fckpt"), tmp("fi-sa-fsam") + "/s")
    b0.write.mode("append").json(fSrc)
    assert(run(fSrc, fCkpt, fSam, None).isEmpty)
    b1.write.mode("append").json(fSrc)
    val failure = run(fSrc, fCkpt, fSam, Some(1L))
    assert(failure.nonEmpty, "injected crash did not fire")
    // the snapshot DID land before the crash — the commit was lost, so the
    // restart replays batch 1 onto its own already-written partition
    assert(spark.read.parquet(s"$fSam/batch_id=1").count() > 0,
      "crash fired before the snapshot write — wrong injection point")
    assert(run(fSrc, fCkpt, fSam, None).isEmpty, "restart failed")

    assert(rowsOf(s"$fSam/batch_id=1") == rowsOf(s"$cSam/batch_id=1"),
      "snapshot diverged after crash-replay")
    assert(
      StreamingSampler.sample(spark, fSam).collect().map(_.toString).sorted.toSeq ==
      StreamingSampler.sample(spark, cSam).collect().map(_.toString).sorted.toSeq,
      "live sample diverged after crash-replay")
  }
}
