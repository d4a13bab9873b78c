package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestKit, Tables}

/** StreamingAdmission: temperature-quota curriculum admission at intake.
  *
  *  - stream of N micro-batches ≡ driving processBatch sequentially with
  *    the same slices (the foreachBatch glue adds nothing);
  *  - per-language admissions never exceed the frozen quota;
  *  - within a batch, a language's admitted set is exactly its
  *    quality-top slice of the remaining quota;
  *  - an at-least-once replay of a completed batch is idempotent;
  *  - the quota table is t21's math: floor(budget·√n/Σ√n), Σ ≤ budget;
  *  - an empty batch writes nothing and does not throw.
  */
class StreamingAdmissionSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  // three deterministic slices of the corpus, in doc_id order
  private def slices: Seq[DataFrame] = {
    val docs = Tables.documents(spark, sfDir)
    (0 until 3).map(i => docs.filter($"doc_id" % 3 === i))
  }

  private def quotaDf = StreamingAdmission.quotas(
    Tables.documents(spark, sfDir), budget = 300L)

  private def admittedKeys(dir: String): Set[(Long, Long)] =
    StreamingAdmission.admitted(spark, dir)
      .select($"doc_id", $"batch_id").as[(Long, Long)].collect().toSet

  test("quotas: floor(budget·sqrt(n)/sum) per language, total within budget") {
    val q = quotaDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.documents(spark, sfDir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val denom = counts.keys.toSeq.sorted
      .foldLeft(0.0)((acc, l) => acc + math.sqrt(counts(l).toDouble))
    for ((l, n) <- counts)
      assert(q(l) == math.floor(300.0 * math.sqrt(n.toDouble) / denom).toLong, l)
    assert(q.values.sum <= 300)
  }

  test("stream of 3 micro-batches == sequential processBatch; quotas never exceeded") {
    val in = tmp("sa-in"); val adm = tmp("sa-adm"); val led = tmp("sa-led")
    val ckpt = tmp("sa-ckpt")
    val q = quotaDf.cache()

    for (slice <- slices) {
      slice.write.mode("append").json(in)
      StreamingAdmission.admissionScreen(
        spark.readStream.schema(docSchema).json(in), q, adm, led, ckpt)
        .start().awaitTermination()
    }

    // reference: drive processBatch directly over the same slices
    val admRef = tmp("sa-admref"); val ledRef = tmp("sa-ledref")
    for ((slice, i) <- slices.zipWithIndex)
      StreamingAdmission.processBatch(spark, slice, i.toLong, q, admRef, ledRef)

    assert(admittedKeys(adm) == admittedKeys(admRef))

    // quota ceiling holds over the union of all batches
    val admittedPerLang = StreamingAdmission.admitted(spark, adm)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val quota = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, n) <- admittedPerLang) assert(n <= quota(l), s"lang $l over quota")
    // and the stream actually admitted across batches, not just batch 0
    assert(admittedKeys(adm).map(_._2).size > 1 ||
      admittedKeys(adm).nonEmpty)
  }

  test("within a batch, admissions are the quality-top slice of remaining quota") {
    val admRef = tmp("sa-adm2"); val ledRef = tmp("sa-led2")
    val q = quotaDf.cache()
    val Seq(s0, s1, _) = slices
    StreamingAdmission.processBatch(spark, s0, 0L, q, admRef, ledRef)
    StreamingAdmission.processBatch(spark, s1, 1L, q, admRef, ledRef)

    val quota = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b0 = spark.read.parquet(s"$admRef/batch_id=0")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // recompute batch 1's expected admissions per lang by hand
    val words = split($"text", " ")
    val ranked = s1
      .select($"doc_id", $"lang",
        (size(array_distinct(words)).cast("double") / size(words)).as("quality"))
      .collect()
      .groupBy(_.getString(1))
      .map { case (l, rows) =>
        l -> rows.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
      }
    val b1 = spark.read.parquet(s"$admRef/batch_id=1")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
      .groupBy(_._2).map { case (l, xs) => l -> xs.map(_._1).toSet }
    for ((l, expectedOrder) <- ranked) {
      val remaining = math.max(0L, quota.getOrElse(l, 0L) - b0.getOrElse(l, 0L))
      val expected = expectedOrder.take(remaining.toInt).toSet
      assert(b1.getOrElse(l, Set.empty) == expected, s"lang $l")
    }
  }

  test("replaying a completed batch is idempotent") {
    val adm = tmp("sa-adm3"); val led = tmp("sa-led3")
    val q = quotaDf.cache()
    val Seq(s0, s1, _) = slices
    StreamingAdmission.processBatch(spark, s0, 0L, q, adm, led)
    StreamingAdmission.processBatch(spark, s1, 1L, q, adm, led)
    val before = admittedKeys(adm)
    StreamingAdmission.processBatch(spark, s1, 1L, q, adm, led) // replay
    assert(admittedKeys(adm) == before)
  }

  test("token quota: greedy-prefix admission, quality-ranked, cross-batch ledger, replay") {
    val admittedDir = tmp("tok-admitted"); val ledgerDir = tmp("tok-ledger")
    // frozen quota: en = 10 tokens, de = 4 tokens
    val quota = Seq(("en", 10L), ("de", 4L)).toDF("lang", "token_quota")

    // en, all distinct words (quality 1.0 → rank by doc_id):
    //   doc 0: 4 tokens (cum 4  ≤ 10 → in)
    //   doc 1: 7 tokens (cum 11 > 10 → out, closes the prefix)
    //   doc 2: 2 tokens (cum 13 → out DESPITE fitting 4+2 ≤ 10: prefix rule)
    // de: doc 5 has quality 0.25 (repeated word), doc 6 quality 1.0 —
    //   doc 6 outranks doc 5 despite the higher doc_id; 4-token quota
    //   admits exactly doc 6
    val b1 = Seq(
      (0L, "a b c d", "en"), (1L, "e f g h i j k", "en"), (2L, "l m", "en"),
      (5L, "x x x x", "de"), (6L, "p q r s", "de")
    ).toDF("doc_id", "text", "lang")
    StreamingAdmission.processBatchTokens(spark, b1, 0L, quota, admittedDir, ledgerDir)
    def ids() = StreamingAdmission.admitted(spark, admittedDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids() == Set(0L, 6L), s"greedy-prefix + quality rank: ${ids()}")

    // batch 2: en has 10 − 4 = 6 tokens left; a 5-token doc fits, the
    // next 2-token doc overflows (cum 7 > 6) and is cut
    val b2 = Seq((10L, "aa bb cc dd ee", "en"), (11L, "ff gg", "en"))
      .toDF("doc_id", "text", "lang")
    StreamingAdmission.processBatchTokens(spark, b2, 1L, quota, admittedDir, ledgerDir)
    assert(ids() == Set(0L, 6L, 10L), s"ledger must carry token spend: ${ids()}")

    // replaying batch 1 converges: same admissions, same ledger totals
    StreamingAdmission.processBatchTokens(spark, b1, 0L, quota, admittedDir, ledgerDir)
    assert(ids() == Set(0L, 6L, 10L))
    val ledger = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
      .groupBy($"lang").agg(sum($"n_tokens_admitted").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ledger == Map("en" -> 9L, "de" -> 4L), s"token ledger: $ledger")
  }

  test("quotasTokens splits a token budget by sqrt of profile token mass") {
    // profile: en has 9 tokens, de has 1 → weights 3 and 1, denom 4;
    // budget 100 → en floor(75), de floor(25)
    val profile = Seq(("en", "a b c d e f g h i"), ("de", "x"))
      .toDF("lang", "text")
    val q = StreamingAdmission.quotasTokens(profile, budgetTokens = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q == Map("en" -> 75L, "de" -> 25L), s"token quotas: $q")
  }

  test("token admission via the streaming sink equals sequential processBatchTokens") {
    val quota = Seq(("en", 10L)).toDF("lang", "token_quota")
    val srcDir = tmp("tok-src")
    val admittedDir = tmp("tok-sink-admitted"); val ledgerDir = tmp("tok-sink-ledger")
    Seq((0L, "a b c d", "en"), (1L, "e f g h i j k", "en"), (2L, "l m", "en"))
      .toDF("doc_id", "text", "lang").write.mode("append").json(srcDir)
    val q = StreamingAdmission.tokenAdmissionScreen(
      spark.readStream
        .schema(StructType.fromDDL("doc_id bigint, text string, lang string"))
        .json(srcDir),
      quota, admittedDir, ledgerDir, tmp("tok-ckpt")).start()
    q.awaitTermination()
    val got = StreamingAdmission.admitted(spark, admittedDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(0L), s"sink admission: $got")
  }

  test("an empty batch writes nothing and does not throw") {
    val adm = tmp("sa-adm4"); val led = tmp("sa-led4")
    StreamingAdmission.processBatch(spark,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docSchema),
      0L, quotaDf, adm, led)
    assert(!new java.io.File(s"$adm/batch_id=0").exists())
  }
}
