package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingRelease: incremental per-language release fingerprints.
  * The contract is MERGEABILITY — N per-batch partial fingerprints fold
  * to exactly the one-shot cut over the union — plus the intake
  * conventions (replay idempotence) and the composed wiring
  * (screenBatchWithQuotaAndRelease's ledger equals a recompute from its
  * own verdicts).
  */
class StreamingReleaseSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def docs(ids: Range, lang: String): DataFrame =
    ids.map(i => (i.toLong, lang, s"text of document number $i with some words"))
      .toDF("doc_id", "lang", "text")

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("N per-batch partials fold to the one-shot cut (mergeable fingerprint)") {
    val dir = tmp("rel")
    val b0 = docs(0 until 20, "en").union(docs(100 until 110, "de"))
    val b1 = docs(20 until 45, "en")
    val b2 = docs(110 until 130, "de").union(docs(200 until 203, "fr"))
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingRelease.appendBatch(b, dir, i.toLong)
    }
    val folded = StreamingRelease.currentRelease(spark, dir)
    val oneShot = StreamingRelease.releaseBatch(b0.union(b1).union(b2))
    assert(sorted(folded) == sorted(oneShot))
    assert(folded.count() == 3) // en, de, fr
  }

  test("replaying a batch converges (dynamic overwrite of its partition)") {
    val dir = tmp("rel-replay")
    StreamingRelease.appendBatch(docs(0 until 10, "en"), dir, 0L)
    StreamingRelease.appendBatch(docs(10 until 30, "en"), dir, 1L)
    val before = sorted(StreamingRelease.currentRelease(spark, dir))
    StreamingRelease.appendBatch(docs(10 until 30, "en"), dir, 1L) // crash-replay
    assert(sorted(StreamingRelease.currentRelease(spark, dir)) == before)
  }

  test("composed intake maintains a release ledger equal to its own verdicts") {
    val indexDir = tmp("rel-idx"); val ledgerDir = tmp("rel-led")
    val releaseDir = tmp("rel-rel")
    val screen = StreamingDecontam.prepare(
      Seq((900L, "completely unrelated held out evaluation content that " +
        "never appears anywhere in the streaming corpus at all"))
        .toDF("doc_id", "text"))
    val quota = Seq(("en", 100L), ("de", 2L)).toDF("lang", "quota")
    val b0 = docs(0 until 8, "en").union(docs(100 until 105, "de"))
    val b1 = docs(8 until 14, "en").union(docs(105 until 109, "de"))

    val all = Seq(b0, b1).zipWithIndex.map { case (b, i) =>
      val v = StreamingIntake.screenBatchWithQuotaAndRelease(
        b, indexDir, i.toLong, screen, quota, ledgerDir, releaseDir)
      val admitted = v.filter(col("admitted")).select(col("doc_id"), col("lang"))
        .join(b.select(col("doc_id"), col("text")), "doc_id")
        .collect()
      v.unpersist()
      admitted
    }
    // the de quota (2) binds across batches — batch 1's de docs are cut off
    val admittedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(all.flatten.toIndexedSeq),
      all.head.headOption.map(_.schema).getOrElse(b0.schema))
    assert(admittedDf.filter(col("lang") === "de").count() == 2)
    assert(sorted(StreamingRelease.currentRelease(spark, releaseDir)) ==
      sorted(StreamingRelease.releaseBatch(admittedDf)))
  }

  test("retraction: the fold lands exactly on the survivors' fingerprint") {
    val dir = tmp("rel-ret")
    val b0 = docs(0 until 20, "en").union(docs(100 until 110, "de"))
    val b1 = docs(20 until 45, "en")
    StreamingRelease.appendBatch(b0, dir, 0L)
    StreamingRelease.appendBatch(b1, dir, 1L)
    // take down 5 en docs (incl. the watermark doc 44) and 3 de docs
    val takedown = docs(40 until 45, "en").union(docs(100 until 103, "de"))
    StreamingRelease.retractBatch(takedown, dir, 0L)
    val survivors = docs(0 until 40, "en").union(docs(103 until 110, "de"))
    val folded = StreamingRelease.currentRelease(spark, dir)
    val fromScratch = StreamingRelease.releaseBatch(survivors)
    // exact on every GROUP component; watermark is high-water by design
    assert(sorted(folded.drop("watermark")) == sorted(fromScratch.drop("watermark")),
      "retraction must land the fold on the survivors' fingerprint")
    assert(folded.filter($"lang" === "en").head().getAs[Long]("watermark") == 44L,
      "watermark is the high-water audit cursor, not a survivor statistic")
    // replaying the retraction converges (own negative partition)
    val settled = sorted(folded)
    StreamingRelease.retractBatch(takedown, dir, 0L)
    assert(sorted(StreamingRelease.currentRelease(spark, dir)) == settled)
    // and a retraction batch id never collides with an admission id
    val parts = spark.read.option("basePath", dir).parquet(dir)
      .select($"__batch").distinct().as[Long].collect().toSet
    assert(parts == Set(0L, 1L, -1L), s"unexpected partition ids: $parts")
  }

  test("takedown composition: tombstone delete feed drives the retraction") {
    // the admitted corpus lives in a tombstone store; a takedown batch
    // deletes keys there, and the delete feed's old images — which
    // suppress double-deletes and unknown keys by construction — are the
    // retraction source. Release ≡ cut over the store's LIVE view.
    val snap = tmp("rel-ts") + "/s"; val cdf = tmp("rel-tscdf") + "/f"
    val relDir = tmp("rel-tsrel")
    val admitted = docs(0 until 30, "en").union(docs(100 until 108, "de"))
      .withColumn("seq", lit(1L)).withColumn("del", lit(false))
    StreamingTombstone.processBatch(spark, admitted, 0L, "doc_id", "seq", "del",
      snap, cdf)
    StreamingRelease.appendBatch(admitted.drop("seq", "del"), relDir, 0L)
    // takedown: two real docs, one double-delete candidate, one unknown
    // key — the feed must emit exactly the two real deletes
    val takedown = Seq(
      (5L, "en", "text of document number 5 with some words", 2L, true),
      (100L, "de", "text of document number 100 with some words", 2L, true),
      (999L, "xx", "never admitted", 2L, true))
      .toDF("doc_id", "lang", "text", "seq", "del")
    StreamingTombstone.processBatch(spark, takedown, 1L, "doc_id", "seq", "del",
      snap, cdf)
    val deletes = StreamingCdf.feed(spark, cdf)
      .filter($"batch_id" === 1L && $"change_type" === "delete")
      .select($"old_image.doc_id".as("doc_id"), $"old_image.lang".as("lang"),
        $"old_image.text".as("text"))
    assert(deletes.count() == 2L)
    StreamingRelease.retractBatch(deletes, relDir, 1L)
    val live = StreamingTombstone.snapshot(spark, snap, "del")
      .select($"doc_id", $"lang", $"text")
    assert(sorted(StreamingRelease.currentRelease(spark, relDir).drop("watermark")) ==
      sorted(StreamingRelease.releaseBatch(live).drop("watermark")),
      "release must track the tombstone store's live view through takedowns")
  }

  test("facade takedown: feed-history collision guard, crash-replay admission") {
    // GraftSession.takedown dynamic-overwrites the feed's batch_id=N —
    // an id colliding with an admission batch would silently destroy
    // that batch's feed history (r10 advice). The guard: ids ≤ the feed
    // high-water mark fail fast, EXCEPT an equal-to-max id whose
    // existing batch is this takedown's own prior attempt (the crash-
    // replay shape, which must keep working for exactly-once).
    val g = graft.GraftSession.attach(spark, sfDir)
    val snap = tmp("rel-gd") + "/s"; val cdf = tmp("rel-gdcdf") + "/f"
    val relDir = tmp("rel-gdrel")
    val admitted = docs(0 until 20, "en")
      .withColumn("seq", lit(1L)).withColumn("del", lit(false))
    StreamingTombstone.processBatch(spark, admitted, 0L, "doc_id", "seq", "del",
      snap, cdf)
    StreamingRelease.appendBatch(admitted.drop("seq", "del"), relDir, 0L)
    StreamingTombstone.processBatch(spark,
      docs(20 until 25, "en").withColumn("seq", lit(2L)).withColumn("del", lit(false)),
      1L, "doc_id", "seq", "del", snap, cdf)

    val erase = Seq((3L, "en", "text of document number 3 with some words", 9L, true))
      .toDF("doc_id", "lang", "text", "seq", "del")
    // colliding with admission history (0 < max, 1 == max but an insert
    // batch over foreign keys) → fail fast, feed untouched
    val feedBefore = sorted(StreamingCdf.feed(spark, cdf))
    intercept[IllegalArgumentException] {
      g.takedown(erase, "seq", "del", snap, cdf, relDir, batchId = 0L)
    }
    intercept[IllegalArgumentException] {
      g.takedown(erase, "seq", "del", snap, cdf, relDir, batchId = 1L)
    }
    assert(sorted(StreamingCdf.feed(spark, cdf)) == feedBefore,
      "a rejected takedown must not touch the feed")
    // fresh id above the mark: works
    assert(g.takedown(erase, "seq", "del", snap, cdf, relDir, batchId = 2L) == 1L)
    // crash-replay with the SAME id: recognized as the prior attempt,
    // idempotent end state
    val afterFirst = sorted(StreamingCdf.feed(spark, cdf))
    assert(g.takedown(erase, "seq", "del", snap, cdf, relDir, batchId = 2L) == 1L)
    assert(sorted(StreamingCdf.feed(spark, cdf)) == afterFirst)
    // but a DIFFERENT takedown may not reuse that id
    val other = Seq((7L, "en", "text of document number 7 with some words", 10L, true))
      .toDF("doc_id", "lang", "text", "seq", "del")
    intercept[IllegalArgumentException] {
      g.takedown(other, "seq", "del", snap, cdf, relDir, batchId = 2L)
    }
  }

  test("takedown crash between tombstone merge and retraction: same-id replay completes") {
    // the REAL crash the guard's prior-attempt admission exists for:
    // takedown dies after the store committed (tombstones + feed) but
    // before the release retraction. Recovery = re-running takedown with
    // the ORIGINAL id; end state must equal a never-interrupted run.
    val g = graft.GraftSession.attach(spark, sfDir)
    def setup(): (String, String, String) = {
      val snap = tmp("rel-cr") + "/s"; val cdf = tmp("rel-crcdf") + "/f"
      val rel = tmp("rel-crrel")
      val admitted = docs(0 until 25, "en")
        .withColumn("seq", lit(1L)).withColumn("del", lit(false))
      StreamingTombstone.processBatch(spark, admitted, 0L, "doc_id", "seq", "del",
        snap, cdf)
      StreamingRelease.appendBatch(admitted.drop("seq", "del"), rel, 0L)
      (snap, cdf, rel)
    }
    val erase = Seq(
      (4L, "en", "text of document number 4 with some words", 5L, true),
      (9L, "en", "text of document number 9 with some words", 5L, true))
      .toDF("doc_id", "lang", "text", "seq", "del")

    // control: never interrupted
    val (cs, cc, cr) = setup()
    assert(g.takedown(erase, "seq", "del", cs, cc, cr, batchId = 1L) == 2L)

    // crashed: step 1 (tombstone merge + feed) committed, retraction never ran
    val (xs, xc, xr) = setup()
    StreamingTombstone.processBatch(spark, erase, 1L, "doc_id", "seq", "del",
      xs, xc)
    // recovery with the SAME id passes the guard and restores the retraction
    assert(g.takedown(erase, "seq", "del", xs, xc, xr, batchId = 1L) == 2L)

    assert(sorted(StreamingTombstone.snapshot(spark, xs, "del")) ==
      sorted(StreamingTombstone.snapshot(spark, cs, "del")))
    assert(sorted(StreamingCdf.feed(spark, xc)) == sorted(StreamingCdf.feed(spark, cc)))
    assert(sorted(StreamingRelease.currentRelease(spark, xr).drop("watermark")) ==
      sorted(StreamingRelease.currentRelease(spark, cr).drop("watermark")))
  }
}
