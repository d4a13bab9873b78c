package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit
import graft.operators.CorpusManifest.Component

/** CorpusManifest: the reproducibility contract.
  *
  *  - two builds from the same inputs emit BYTE-identical manifest files
  *    (the VERDICT r8 "done =" bar);
  *  - the fingerprint is order-independent but multiplicity-sensitive;
  *  - verify() passes on the truth and fails loudly on tampered counts,
  *    hashes, watermarks, and on components missing from either side;
  *  - snapshotIntakeRun manifests a real composed-intake output tree.
  */
class ManifestSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def docs: DataFrame =
    Seq((1L, "alpha", "en"), (2L, "beta", "de"), (3L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")

  private def comps(df: DataFrame) = Seq(
    Component("docs", df, Seq(col("doc_id"), col("text"), col("lang")), col("doc_id")))

  private def onlyParquet(dir: String): java.io.File = {
    val fs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(fs.length == 1, s"expected exactly one manifest file, got ${fs.length}")
    fs.head
  }

  test("two builds from the same inputs emit byte-identical manifests") {
    val d1 = tmp("mfa"); val d2 = tmp("mfb")
    CorpusManifest.write(CorpusManifest.build(7L, comps(docs)), d1)
    // second build: same logical rows, DIFFERENT physical order/partitioning
    CorpusManifest.write(
      CorpusManifest.build(7L, comps(docs.repartition(3).sortWithinPartitions(desc("doc_id")))),
      d2)
    val b1 = Files.readAllBytes(onlyParquet(s"$d1/version=7").toPath)
    val b2 = Files.readAllBytes(onlyParquet(s"$d2/version=7").toPath)
    assert(java.util.Arrays.equals(b1, b2), "manifest bytes must be reproducible")
  }

  test("fingerprint is order-independent but multiplicity-sensitive") {
    val base = CorpusManifest.fingerprint(comps(docs).head).collect().head
    val shuffled = CorpusManifest.fingerprint(
      comps(docs.repartition(5)).head).collect().head
    assert(base == shuffled)
    // duplicate a row: xor of the pair cancels, but sum_hash and n_rows move
    val dup = CorpusManifest.fingerprint(
      comps(docs.union(docs.limit(1))).head).collect().head
    assert(dup.getLong(1) == base.getLong(1) + 1, "n_rows sees the dup")
    assert(dup.getLong(3) != base.getLong(3), "sum_hash sees the dup")
    // null vs empty-string must not alias
    val withEmpty = docs.withColumn("text",
      when(col("doc_id") === 3L, lit("")).otherwise(col("text")))
    val e = CorpusManifest.fingerprint(comps(withEmpty).head).collect().head
    assert(e.getLong(2) != base.getLong(2), "null and '' must hash differently")
  }

  test("verify passes on truth and fails loudly on every tamper class") {
    val dir = tmp("mfv")
    CorpusManifest.write(CorpusManifest.build(1L, comps(docs)), dir)
    val m = CorpusManifest.read(spark, dir, 1L)
    val okRows = CorpusManifest.verify(m, comps(docs)).collect()
    assert(okRows.length == 1 && okRows.head.getAs[Boolean]("ok"))

    def tamper(c: String, v: Any) =
      m.withColumn(c, lit(v).cast(m.schema(c).dataType))
    assert(!CorpusManifest.verify(tamper("n_rows", 99L), comps(docs))
      .collect().head.getAs[Boolean]("ok"))
    assert(!CorpusManifest.verify(tamper("xor_hash", 1L), comps(docs))
      .collect().head.getAs[Boolean]("ok"))
    assert(!CorpusManifest.verify(tamper("sum_hash", 1L), comps(docs))
      .collect().head.getAs[Boolean]("ok"))
    assert(!CorpusManifest.verify(tamper("watermark", "drift"), comps(docs))
      .collect().head.getAs[Boolean]("ok"))
    // a changed CORPUS under an honest manifest also fails
    assert(!CorpusManifest.verify(m, comps(docs.filter(col("doc_id") =!= 2L)))
      .collect().head.getAs[Boolean]("ok"))
  }

  test("missing components surface as present=false, never silently pass") {
    val dir = tmp("mfm")
    val extra = Component("extra", docs.limit(1), Seq(col("doc_id")), col("doc_id"))
    CorpusManifest.write(CorpusManifest.build(1L, comps(docs) :+ extra), dir)
    val m = CorpusManifest.read(spark, dir, 1L)
    // live side lost a component the manifest promises
    val lost = CorpusManifest.verify(m, comps(docs)).collect()
      .map(r => r.getAs[String]("component") -> r.getAs[Boolean]("ok")).toMap
    assert(lost("docs") && !lost("extra"))
    // manifest side never heard of a live component
    val unknown = Component("unknown", docs, Seq(col("doc_id")), col("doc_id"))
    val rows = CorpusManifest.verify(m, comps(docs) :+ extra :+ unknown).collect()
      .map(r => r.getAs[String]("component") -> r.getAs[Boolean]("ok")).toMap
    assert(rows("docs") && rows("extra") && !rows("unknown"))
  }

  test("diff classifies every transition and signs the row deltas") {
    val emb = Component("keep", docs, Seq(col("doc_id")), col("doc_id"))
    val v1 = CorpusManifest.build(1L, Seq(
      comps(docs).head, // "docs", 3 rows
      emb,
      Component("gone", docs.limit(2), Seq(col("doc_id")), col("doc_id"))))
    val v2 = CorpusManifest.build(2L, Seq(
      Component("docs", docs.filter(col("doc_id") =!= 2L),
        Seq(col("doc_id"), col("text"), col("lang")), col("doc_id")),
      emb,
      Component("fresh", docs.union(docs), Seq(col("doc_id")), col("doc_id"))))
    val d = CorpusManifest.diff(v1, v2).collect()
      .map(r => r.getAs[String]("component") ->
        (r.getAs[String]("status"), r.getAs[Long]("rows_delta"),
          r.getAs[Boolean]("content_changed"))).toMap
    assert(d("docs") == (("changed", -1L, true)))
    assert(d("keep") == (("unchanged", 0L, false)))
    assert(d("gone") == (("removed", -2L, true)))
    assert(d("fresh") == (("added", 6L, true)))
  }

  test("schemaComponent surfaces every schema-drift class through the standard diff") {
    def mf(df: DataFrame, v: Long) =
      CorpusManifest.build(v, Seq(CorpusManifest.schemaComponent("docs_schema", df)))
    def diffOf(a: DataFrame, b: DataFrame) =
      CorpusManifest.diff(mf(a, 1L), mf(b, 2L)).collect().map(r =>
        (r.getAs[String]("status"), r.getAs[Long]("rows_delta"),
          r.getAs[Boolean]("content_changed"))).head

    // identical schema (different DATA) → unchanged: this component
    // watches shape, not content
    assert(diffOf(docs, docs.filter(col("doc_id") === 1L)) ==
      (("unchanged", 0L, false)))
    // added column
    assert(diffOf(docs, docs.withColumn("extra", lit(1))) == (("changed", 1L, true)))
    // dropped column
    assert(diffOf(docs, docs.drop("lang")) == (("changed", -1L, true)))
    // renamed column (same count, content moved)
    assert(diffOf(docs, docs.withColumnRenamed("lang", "language")) ==
      (("changed", 0L, true)))
    // retyped column — the drift class the VALUE hashes can miss when the
    // cast is lossless on the canonical string
    assert(diffOf(docs, docs.withColumn("doc_id", col("doc_id").cast("string"))) ==
      (("changed", 0L, true)))
    // and verify() pins "the schema I trained against": truth passes,
    // drifted schema fails
    val m = mf(docs, 1L)
    assert(CorpusManifest.verify(m,
      Seq(CorpusManifest.schemaComponent("docs_schema", docs)))
      .collect().forall(_.getAs[Boolean]("ok")))
    assert(!CorpusManifest.verify(m,
      Seq(CorpusManifest.schemaComponent("docs_schema", docs.drop("lang"))))
      .collect().forall(_.getAs[Boolean]("ok")))
  }

  test("snapshotIntakeRun manifests a composed-intake output tree") {
    import graft.streaming.{StreamingDecontam, StreamingIntake}
    val indexDir = tmp("mf-idx"); val ledgerDir = tmp("mf-led")
    val verdictDir = tmp("mf-ver"); val manifestDir = tmp("mf-man")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (3L, "ein ganz anderer text ohne jede gemeinsamkeit mit den anderen", "de"))
      .toDF("doc_id", "text", "lang")
    val screen = StreamingDecontam.prepare(
      Seq((100L, "nothing here matches the corpus at all in any way shape or form"))
        .toDF("doc_id", "text"))
    val quota = Seq(("en", 10L), ("de", 10L)).toDF("lang", "quota")
    val verdicts = StreamingIntake.screenBatchWithQuota(
      batch, indexDir, 0L, screen, quota, ledgerDir)
    verdicts.withColumn("__batch", lit(0L))
      .write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("__batch").parquet(verdictDir)
    verdicts.unpersist()

    val m = CorpusManifest.snapshotIntakeRun(spark, 1L,
      verdictDir, ledgerDir, indexDir, manifestDir)
    val byComp = m.collect().map(r =>
      r.getAs[String]("component") -> r.getAs[Long]("n_rows")).toMap
    assert(byComp.keySet ==
      Set("intake_verdicts", "quota_ledger_totals", "band_index"))
    assert(byComp("intake_verdicts") == 3L)
    assert(Files.exists(Paths.get(s"$manifestDir/version=1")))
  }

  test("expire keeps the newest versions, refuses total wipe, stays idempotent") {
    val dir = tmp("mfexp")
    (1L to 4L).foreach { v =>
      CorpusManifest.write(CorpusManifest.build(v, comps(docs)), dir)
    }
    assert(CorpusManifest.versions(spark, dir) == Seq(1L, 2L, 3L, 4L))
    val gone = CorpusManifest.expire(spark, dir, keepLast = 2)
    assert(gone == Seq(1L, 2L))
    assert(CorpusManifest.versions(spark, dir) == Seq(3L, 4L))
    // surviving versions still read and diff
    val d = CorpusManifest.diff(
      CorpusManifest.read(spark, dir, 3L), CorpusManifest.read(spark, dir, 4L))
    assert(d.count() > 0)
    // idempotent
    assert(CorpusManifest.expire(spark, dir, keepLast = 2).isEmpty)
    // never expires the last one standing
    assert(CorpusManifest.expire(spark, dir, keepLast = 1) == Seq(3L))
    assert(CorpusManifest.expire(spark, dir, keepLast = 1).isEmpty)
    assert(CorpusManifest.versions(spark, dir) == Seq(4L))
    intercept[IllegalArgumentException](CorpusManifest.expire(spark, dir, 0))
  }
}
