package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke test for the [[GraftSession]] facade (VERDICT r8 item 7): one
  * object drives the registry, the commerce pipeline, and the curation
  * stack — each delegate is oracle-/spec-gated in its own module, so
  * this spec checks wiring, not semantics.
  */
class GraftSessionSpec extends AnyFunSuite with SparkTestKit {

  private lazy val g = GraftSession.attach(spark, sfDir)

  test("registry: names resolve, queries run, unknown names fail loudly") {
    assert(g.queryNames.size >= 170)
    assert(g.run("q1_agg").count() > 0)
    assert(g.table("documents").count() > 0)
    val e = intercept[NoSuchElementException](g.run("nope"))
    assert(e.getMessage.contains("queryNames"))
  }

  test("commerce pipeline: warehouse written, views queryable, KPI non-empty") {
    val dir = Files.createTempDirectory("gs-wh").toString
    val kpi = g.runCommercePipeline(dir)
    assert(kpi.count() > 0)
    assert(g.sql("SELECT count(*) AS n FROM exec_daily_kpi").collect().head.getLong(0) > 0)
    assert(new java.io.File(s"$dir/wholesale_cm2").exists())
    assert(g.execDailyKpi().count() > 0)
  }

  test("curation stack: near-dup pairs, clusters, ANN, snapshot round trip") {
    assert(g.nearDupPairs().columns.toSet ==
      Set("doc_a", "doc_b", "est_jaccard"))
    assert(g.dupClusters().count() > 0)
    val probes = g.table("embeddings").filter(col("vec_id") < 4)
    val ann = g.annTopK(probes, topK = 2).collect()
    assert(ann.nonEmpty && ann.forall(_.getAs[Int]("rank") <= 2))
    val mdir = Files.createTempDirectory("gs-manifest").toString
    val m = g.snapshot(1L, mdir)
    assert(m.count() == 2)
    val v = g.verifySnapshot(1L, mdir).collect()
    assert(v.length == 2 && v.forall(_.getAs[Boolean]("ok")))
  }

  test("streaming entry points: full intake and WAP load drive end to end") {
    import spark.implicits._
    val work = Files.createTempDirectory("gs-intake").toString
    val src = Files.createTempDirectory("gs-src").toString
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta", "en",
        Array(1.0f, 0.0f)),
      (2L, "iota kappa lambda mu nu xi omicron pi", "en", Array(0.0f, 1.0f)))
      .toDF("doc_id", "text", "lang", "embedding")
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id bigint, text string, lang string, embedding array<float>")
      .parquet(src)
    val evalDocs = Seq((900L, "rho sigma tau upsilon phi chi psi omega"))
      .toDF("doc_id", "text")
    val quota = Seq(("en", 10L)).toDF("lang", "quota")
    g.runIntake(stream, evalDocs, quota, work).awaitTermination()
    val verdicts = spark.read.parquet(s"$work/verdicts")
    assert(verdicts.count() == 2 &&
      verdicts.filter(col("admitted")).count() == 2)

    val wapWork = Files.createTempDirectory("gs-wap").toString
    val wapSrc = Files.createTempDirectory("gs-wapsrc").toString
    Seq((1L, 5.0), (2L, 7.0)).toDF("id", "value")
      .write.mode("append").parquet(wapSrc)
    val rows = spark.readStream.schema("id bigint, value double").parquet(wapSrc)
    g.runWapLoad(rows,
      Seq(streaming.StreamingWap.Expectation("value_positive", col("value") > 0)),
      wapWork).awaitTermination()
    assert(streaming.StreamingWap.table(spark, s"$wapWork/table").count() == 2)
  }

  test("streaming entry point: maintainView applies a change feed to a live MV") {
    import spark.implicits._
    val src = Files.createTempDirectory("gs-mvsrc").toString
    val mvDir = Files.createTempDirectory("gs-mv").toString
    val ckpt = Files.createTempDirectory("gs-mvckpt").toString
    Seq(
      (1L, "insert", Option.empty[Long], Option.empty[Long], Some(10L), Some(100L)),
      (2L, "insert", Option.empty[Long], Option.empty[Long], Some(10L), Some(50L)))
      .toDF("key", "change_type", "old_grp", "old_cents", "new_grp", "new_cents")
      .write.mode("append").json(src)
    val feed = spark.readStream
      .schema("key bigint, change_type string, old_grp bigint, " +
        "old_cents bigint, new_grp bigint, new_cents bigint")
      .json(src)
    g.maintainView(feed, mvDir, ckpt).awaitTermination()
    val v = streaming.StreamingMv.view(spark, mvDir).collect()
    assert(v.length == 1 && v.head.getAs[Long]("n_rows") == 2L
      && v.head.getAs[Long]("sum_cents") == 150L)
  }
}
