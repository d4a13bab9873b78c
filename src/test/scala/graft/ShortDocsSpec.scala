package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Dedup, TextAnalysis}

/** Short-document edge cases for the n-gram generators.
  *
  * Spark's `sequence(1, 0)` is the DESCENDING array [1, 0] — unguarded,
  * a 2-word doc would emit a spurious partial "shingle" (out-of-range
  * w[i] turn null and concat_ws silently skips them) while DuckDB's
  * `generate_series(1, 0)` is empty. These tests pin the guarded
  * behavior: docs shorter than the n-gram width emit NOTHING, matching
  * the oracle's generate_series semantics on any corpus, not just one
  * without short docs.
  */
class ShortDocsSpec extends AnyFunSuite with SparkTestKit {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-shortdocs").toFile
    d.deleteOnExit()
    val rows = Seq(
      // two identical 2-word docs: the unguarded shingle bug paired these
      (1L, "alpha beta", "en", "src0", 10L),
      (2L, "alpha beta", "en", "src1", 10L),
      (3L, "gamma", "en", "src1", 5L),
      (4L, "one two three four five six seven", "en", "src1", 33L), // 7 words: below 8-gram width
      (5L, "delta epsilon zeta", "en", "src1", 18L))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"${d.getAbsolutePath}/documents.parquet")
    d.getAbsolutePath
  }

  test("d2 jaccard: sub-3-word docs emit no shingles, so no spurious pairs") {
    assert(Dedup.jaccard.run(spark, dir).count() === 0)
  }

  test("d3 minhash: sub-3-word docs get no signature, so no candidate pairs") {
    assert(Dedup.minhashPairs(spark, dir).count() === 0)
  }

  test("d6 contamination: sub-8-word docs emit no 8-grams") {
    // doc 1 (src0) is the eval split; docs 2-5 are train — all under 8
    // words, so no 8-gram can be shared and nothing is flagged
    assert(Dedup.contamination.run(spark, dir).count() === 0)
  }

  test("t14 lm score: sub-2-word docs are absent (no bigrams to score)") {
    import spark.implicits._
    val scored = graft.queries.TrainingPrep.bigramLmScore.run(spark, dir)
      .select($"doc_id").as[Long].collect().toSet
    assert(!scored.contains(3L)) // "gamma" — 1 word
    assert(scored.contains(1L) && scored.contains(4L))
  }

  test("t15 chunking: a 1-word doc yields exactly one 1-token chunk") {
    import spark.implicits._
    val chunks = graft.queries.TrainingPrep.chunking.run(spark, dir)
      .filter($"doc_id" === 3L)
      .select($"chunk_id", $"chunk_tokens", $"chunk_text")
      .as[(Long, Long, String)].collect()
    assert(chunks.toSeq == Seq((0L, 1L, "gamma")))
  }

  test("t16 max run: docs without consecutive repeats report run 1") {
    import spark.implicits._
    val runs = graft.queries.TrainingPrep.maxWordRun.run(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(runs(3L) == 1L) // single word
    assert(runs(1L) == 1L) // "alpha beta" — distinct words
  }

  test("t5 ngram stats: 1-word docs emit no bigrams") {
    import spark.implicits._
    val bigrams = TextAnalysis.ngramStats.run(spark, dir)
    val freq = bigrams.select($"bigram", $"freq").as[(String, Long)].collect().toMap
    // "gamma" (1 word) contributes nothing; "alpha beta" docs contribute
    // one bigram each
    assert(!freq.keySet.exists(_ == "gamma"))
    assert(freq("alpha beta") === 2)
  }
}
