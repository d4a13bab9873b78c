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
}
