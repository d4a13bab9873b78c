package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit
import graft.operators.CorpusManifest

/** The GDPR / erasure LIFECYCLE end-to-end, through the REAL composed
  * pieces rather than a hand-built store (the CdfLifecycleSpec
  * discipline applied to the takedown path):
  *
  *   intake (screens + quota + release fingerprints)
  *     → admitted corpus mirrored into a tombstone store, batch-aligned
  *     → manifest v1 cut over (live corpus, release)
  *     → `GraftSession.takedown` erases admitted docs (tombstone merge +
  *       delete feed + release retraction, behind the r11 collision guard)
  *     → release still tracks the live view EXACTLY; time travel to the
  *       pre-takedown version still reproduces it (erasure is a new
  *       version — history physically disappears only at vacuum)
  *     → manifest v2 verifies bit-for-bit and diff(v1, v2) names exactly
  *       what the erasure changed.
  */
class GdprLifecycleSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def sentence(seed: Int): String =
    (0 until 12).map(i => s"g${seed}w$i").mkString(" ")
  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("intake -> mirrored store -> manifest v1 -> takedown -> manifest v2 diff") {
    val g = graft.GraftSession.attach(spark, sfDir)
    val index = tmp("gdpr-ix") + "/ix"
    val ledger = tmp("gdpr-led"); val rel = tmp("gdpr-rel")
    val snap = tmp("gdpr-snap") + "/s"; val cdf = tmp("gdpr-cdf") + "/f"
    val mdir = tmp("gdpr-m")
    val screen = StreamingDecontam.prepare(
      Seq((900L, sentence(999))).toDF("doc_id", "text"))
    val quota = Seq(("en", 100L)).toDF("lang", "quota")

    // two intake batches; the admitted set mirrors into the tombstone
    // store under the SAME batch ids (one admission sequence, two views)
    val batches = Seq(
      (0 until 10).map(i => (i.toLong, sentence(i), "en")),
      (10 until 18).map(i => (i.toLong, sentence(i), "en")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val b = rows.toDF("doc_id", "text", "lang")
      val v = StreamingIntake.screenBatchWithQuotaAndRelease(b, index,
        i.toLong, screen, quota, ledger, rel)
      val admitted = v.filter($"admitted").select($"doc_id")
        .join(b, "doc_id")
        .withColumn("seq", lit(1L)).withColumn("del", lit(false))
      StreamingTombstone.processBatch(spark, admitted, i.toLong,
        "doc_id", "seq", "del", snap, cdf)
      v.unpersist()
    }

    def live(): DataFrame = StreamingTombstone.snapshot(spark, snap, "del")
      .select($"doc_id", $"lang", $"text")
    def comps(): Seq[CorpusManifest.Component] = Seq(
      CorpusManifest.Component("corpus", live(),
        Seq(col("doc_id"), col("lang"), col("text")), col("doc_id")),
      CorpusManifest.Component("release",
        StreamingRelease.currentRelease(spark, rel).drop("watermark"),
        Seq(col("lang"), col("n_docs"), col("n_chars"), col("xor_hash")),
        col("n_docs")))

    val preLive = sorted(live())
    assert(preLive.size == 18, "all fixture docs should admit")
    CorpusManifest.write(CorpusManifest.build(1L, comps()), mdir)

    // erase two admitted docs through the facade (merge + feed +
    // retraction in one call, id above the feed's high-water mark)
    val erase = Seq(
      (3L, sentence(3), "en"), (12L, sentence(12), "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("seq", lit(2L)).withColumn("del", lit(true))
    assert(g.takedown(erase, "seq", "del", snap, cdf, rel, batchId = 2L) == 2L)

    // the release tracks the live view exactly through the erasure
    assert(sorted(StreamingRelease.currentRelease(spark, rel).drop("watermark")) ==
      sorted(StreamingRelease.releaseBatch(live()).drop("watermark")))
    // time travel: the pre-takedown version is still reconstructible
    assert(sorted(g.snapshotAsOfDeletes(snap, cdf, "doc_id", "del", version = 1L)
      .select($"doc_id", $"lang", $"text")) == preLive)

    // manifest v2: verifies bit-for-bit against the post-erasure state
    CorpusManifest.write(CorpusManifest.build(2L, comps()), mdir)
    val ver = CorpusManifest.verify(
      CorpusManifest.read(spark, mdir, 2L), comps()).collect()
    assert(ver.nonEmpty && ver.forall(_.getAs[Boolean]("ok")),
      s"manifest v2 failed verification: ${ver.mkString(", ")}")
    // and the diff names exactly what the erasure changed
    val d = CorpusManifest.diff(
        CorpusManifest.read(spark, mdir, 1L), CorpusManifest.read(spark, mdir, 2L))
      .collect().map(r => r.getAs[String]("component") ->
        (r.getAs[String]("status"), r.getAs[Long]("rows_delta"))).toMap
    assert(d("corpus") == (("changed", -2L)), s"corpus diff: ${d("corpus")}")
    assert(d("release")._1 == "changed", s"release diff: ${d("release")}")
  }

  test("MULTIMODAL erasure: takedown reaches the vector index and the manifest names both") {
    val g = graft.GraftSession.attach(spark, sfDir)
    val snap = tmp("gdprm-snap") + "/s"; val cdf = tmp("gdprm-cdf") + "/f"
    val rel = tmp("gdprm-rel"); val vix = tmp("gdprm-vix") + "/ix"
    val mdir = tmp("gdprm-m")
    def oneHot(d: Int): Seq[Float] = Seq.tabulate(16)(i => if (i == d) 1f else 0f)

    // two batches of (doc, embedding): docs into the tombstone store +
    // release, embeddings into the maintained IVF index, SAME batch ids
    val rows = (0 until 16).map(i => (i.toLong, sentence(i), "en", oneHot(i)))
    rows.grouped(8).zipWithIndex.foreach { case (rs, i) =>
      val docs = rs.map(r => (r._1, r._2, r._3)).toDF("doc_id", "text", "lang")
        .withColumn("seq", lit(1L)).withColumn("del", lit(false))
      StreamingTombstone.processBatch(spark, docs, i.toLong,
        "doc_id", "seq", "del", snap, cdf)
      StreamingRelease.appendBatch(
        rs.map(r => (r._1, r._3, r._2)).toDF("doc_id", "lang", "text"), rel, i.toLong)
      val vecs = rs.map(r => (r._1, r._4, 0)).toDF("vec_id", "embedding", "label")
        .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
          "cast(label as int) as label")
      StreamingIvf.ingestBatch(vecs, vix, i.toLong, trainOnFirstBatch = i == 0, k = 4)
    }

    def live(): DataFrame = StreamingTombstone.snapshot(spark, snap, "del")
      .select($"doc_id", $"lang", $"text")
    def comps(): Seq[CorpusManifest.Component] = Seq(
      CorpusManifest.Component("corpus", live(),
        Seq(col("doc_id"), col("lang"), col("text")), col("doc_id")),
      CorpusManifest.Component("embeddings",
        StreamingIvf.livePostings(spark, vix).get,
        Seq(col("vec_id"), CorpusManifest.quantizedVec(col("embedding")),
          col("label")), col("vec_id")))
    CorpusManifest.write(CorpusManifest.build(1L, comps()), mdir)

    // erase docs 3 and 12 from BOTH stores through the facade
    val ids = Seq(3L, 12L)
    val erase = ids.map(i => (i, sentence(i.toInt), "en")).toDF("doc_id", "text", "lang")
      .withColumn("seq", lit(2L)).withColumn("del", lit(true))
    assert(g.takedown(erase, "seq", "del", snap, cdf, rel, batchId = 2L) == 2L)
    assert(g.retractVectors(vix, ids.toDF("vec_id"), retractionId = 0L) == 2L)

    // probes exclude the erased vectors immediately (logical), and the
    // purge makes the erasure physical without moving results
    val probes = Seq((3L, oneHot(3), 0), (5L, oneHot(5), 0))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding",
        "cast(label as int) as label")
    def neighborIds(): Set[Long] =
      StreamingIvf.probe(spark, vix, probes, nprobe = 4, topK = 16)
        .select($"neighbor_id").collect().map(_.getLong(0)).toSet
    val logical = neighborIds()
    assert(ids.forall(i => !logical.contains(i)), s"erased vec probed: $logical")
    val (_, purged) = g.purgeVectors(vix)
    assert(purged == 2L)
    assert(neighborIds() == logical, "purge must not move probe results")

    // manifest v2: verification green, diff names BOTH erasures
    CorpusManifest.write(CorpusManifest.build(2L, comps()), mdir)
    val ver = CorpusManifest.verify(
      CorpusManifest.read(spark, mdir, 2L), comps()).collect()
    assert(ver.forall(_.getAs[Boolean]("ok")), ver.mkString(", "))
    val d = CorpusManifest.diff(
        CorpusManifest.read(spark, mdir, 1L), CorpusManifest.read(spark, mdir, 2L))
      .collect().map(r => r.getAs[String]("component") ->
        ((r.getAs[String]("status"), r.getAs[Long]("rows_delta")))).toMap
    assert(d("corpus") == (("changed", -2L)), s"corpus diff: ${d("corpus")}")
    assert(d("embeddings") == (("changed", -2L)), s"embeddings diff: ${d("embeddings")}")
  }
}
