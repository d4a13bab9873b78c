package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftSession, SparkTestKit}
import graft.operators.CorpusManifest

/** The DATA-LIFECYCLE composition (r9 verdict #4): upsert store → change
  * feed → maintained view → point-in-time snapshot → versioned manifest,
  * driven end-to-end through the [[GraftSession]] facade the way the
  * README's lifecycle section shows it. The pieces are each spec-gated
  * alone (StreamingCdfSpec, StreamingMvSpec, ManifestSpec); this spec
  * pins the CONTRACT BETWEEN them:
  *
  *  1. the view maintained live from the CDF equals the aggregate of the
  *     live snapshot (feed ≡ store, through the MV algebra);
  *  2. for every historical version v, the time-traveled snapshot
  *     `asOf(v)` aggregates to exactly the view recomputed from the feed
  *     PREFIX `batch_id ≤ v` — reverse-applying the feed (time travel)
  *     and forward-applying it (view maintenance) meet at the same state;
  *  3. the manifest version cut live at time v verifies bit-for-bit
  *     against components RECONSTRUCTED LATER via time travel — the
  *     reproducibility contract across the whole lifecycle.
  */
class CdfLifecycleSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // three upsert batches over (k, grp, cents, seq): inserts, then a
  // grp-moving update + an insert, then a cents-changing update + a
  // stale redelivery the merge must ignore
  private val batches = Seq(
    Seq((1L, 0L, 100L, 1L), (2L, 0L, 250L, 1L), (3L, 1L, 400L, 1L), (4L, 2L, 50L, 1L)),
    Seq((2L, 1L, 300L, 2L), (5L, 2L, 75L, 2L)),
    Seq((3L, 1L, 440L, 3L), (1L, 0L, 100L, 0L)) // second row: stale seq, no-op
  )

  private def toDf(rows: Seq[(Long, Long, Long, Long)]): DataFrame =
    rows.toDF("k", "grp", "cents", "seq")

  /** CDF envelope → the StreamingMv feed contract. */
  private def mvFeed(feed: DataFrame): DataFrame =
    feed.select(col("key"), col("change_type"),
      col("old_image.grp").as("old_grp"), col("old_image.cents").as("old_cents"),
      col("new_image.grp").as("new_grp"), col("new_image.cents").as("new_cents"))

  private def aggOf(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.groupBy($"grp").agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"),
      min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def viewOf(dir: String): Set[(Long, Long, Long, Long, Long)] =
    StreamingMv.view(spark, dir)
      .select($"grp", $"n_rows", $"sum_cents", $"min_cents", $"max_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def components(snapshot: DataFrame, view: DataFrame): Seq[CorpusManifest.Component] = Seq(
    CorpusManifest.Component("snapshot", snapshot,
      Seq(col("k"), col("grp"), col("cents"), col("seq")), col("seq")),
    CorpusManifest.Component("view", view,
      Seq(col("grp"), col("n_rows"), col("sum_cents"), col("min_cents"),
        col("max_cents")), col("grp")))

  test("upsert -> feed -> view -> time travel -> manifest: one lifecycle, all states agree") {
    val g = GraftSession.attach(spark, sfDir)
    val src = tmp("lc-src")
    val snap = tmp("lc-snap") + "/s"; val cdf = tmp("lc-cdf") + "/f"
    val upCkpt = tmp("lc-upckpt")
    val viewDir = tmp("lc-view") + "/v"; val mvCkpt = tmp("lc-mvckpt")
    val mdir = tmp("lc-manifests")

    batches.zipWithIndex.foreach { case (rows, v) =>
      // 1. upsert the batch through the facade: snapshot + change feed
      toDf(rows).write.mode("append").json(src)
      g.upsertWithCdf(
        spark.readStream.schema(
          org.apache.spark.sql.types.StructType.fromDDL(
            "k bigint, grp bigint, cents bigint, seq bigint"))
          .json(src), "k", "seq", snap, cdf, upCkpt)
        .awaitTermination()
      // 2. maintain the view from the feed (file-stream over the CDF dirs —
      //    the consumer never touches the snapshot)
      g.maintainView(
        mvFeed(spark.readStream.schema(spark.read.parquet(cdf).schema)
          .option("basePath", cdf).parquet(cdf)),
        viewDir, mvCkpt).awaitTermination()
      // 3. cut the corpus version while this IS the live state
      CorpusManifest.write(CorpusManifest.build(v.toLong,
        components(spark.read.parquet(snap).drop("__bucket"),
          StreamingMv.view(spark, viewDir))), mdir)
    }

    // (1) live view ≡ aggregate of the live snapshot
    val liveSnap = spark.read.parquet(snap).drop("__bucket")
    assert(viewOf(viewDir) == aggOf(liveSnap), "live view drifted from the snapshot")
    // the stale redelivery really was suppressed
    assert(liveSnap.filter($"k" === 1L).select($"seq").head().getLong(0) == 1L)

    // (2) per version: time travel ≡ view recomputed from the feed prefix
    val allFeed = StreamingCdf.feed(spark, cdf)
    (0L to 2L).foreach { v =>
      val asOfV = g.snapshotAsOf(snap, cdf, "k", v)
      // forward-apply the prefix through the SAME MV algebra, fresh store
      val prefixDir = tmp(s"lc-prefix$v") + "/v"
      (0L to v).foreach { b =>
        StreamingMv.processBatch(spark,
          mvFeed(allFeed.filter($"batch_id" === b)), b, prefixDir)
      }
      assert(aggOf(asOfV) == viewOf(prefixDir),
        s"asOf($v) disagrees with the view recomputed from feed prefix <= $v")
      // (3) the manifest cut live at v verifies against the RECONSTRUCTED state
      val mv = spark.read.parquet(s"$mdir/version=$v")
      val verdict = CorpusManifest.verify(mv,
        components(asOfV, StreamingMv.view(spark, prefixDir)))
      assert(verdict.filter(!$"ok").isEmpty,
        s"manifest v$v failed verification against time-traveled state: " +
          verdict.collect().mkString("; "))
    }

    // the audit trail reads as expected: v0 -> v2 changed both components
    val d = CorpusManifest.diff(
      spark.read.parquet(s"$mdir/version=0"), spark.read.parquet(s"$mdir/version=2"))
    assert(d.filter($"status" === "changed").count() == 2L,
      s"v0->v2 diff: ${d.collect().mkString("; ")}")
    assert(CorpusManifest.versions(spark, mdir) == Seq(0L, 1L, 2L))
  }
}
