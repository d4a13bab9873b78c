package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Bpe

/** BPE training/application semantics beyond the DuckDB parity gate:
  * hand-checked merge trajectories, the left-to-right non-overlapping
  * rule, tie-breaks, the no-pairs sentinel, and the count invariants the
  * corpus query must satisfy.
  */
class BpeSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("training walks the hand-computed trajectory on a tiny vocab") {
    // freq-weighted counts: 'ab' appears in both words; weight decides
    //   vocab: ("abab", 2), ("abc", 3)
    // round 1 pairs: (a,b): 2*2+3 = 7; (b,a): 2; (b,c): 3 → merge (a,b)
    // round 2 states: [ab,ab]x2, [ab,c]x3 → (ab,ab): 2; (ab,c): 3 → (ab,c)
    // round 3: [ab,ab]x2 → (ab,ab): 2 → merge (ab,ab)
    // round 4: no pairs anywhere → sentinel
    val m = Bpe.trainMerges(Seq(("abab", 2L), ("abc", 3L)), 4)
    assert(m == Seq(("a", "b"), ("ab", "c"), ("ab", "ab"), ("", "")))
  }

  test("merge application is left-to-right non-overlapping") {
    // "aaa" with pair (a,a): first two fuse, third survives
    assert(Bpe.trainMerges(Seq(("aaa", 1L)), 1) == Seq(("a", "a")))
    val m2 = Bpe.trainMerges(Seq(("aaa", 1L)), 2)
    // after round 1: [aa, a] → the only pair is (aa, a)
    assert(m2 == Seq(("a", "a"), ("aa", "a")))
  }

  test("argmax ties break to the lexicographically smallest pair") {
    // "ba" and "ab" each once: (b,a) and (a,b) both count 1 → (a,b) wins
    val m = Bpe.trainMerges(Seq(("ba", 1L), ("ab", 1L)), 1)
    assert(m == Seq(("a", "b")))
  }

  test("corpus query: counts are consistent and merges are non-trivial") {
    val out = Bpe.bpeTokenize.run(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.count() == docs)
    // chars >= tokens >= words (every word is >= 1 token, tokens can't
    // outnumber characters), all strictly positive on this corpus
    assert(out.filter($"n_tokens_bpe" > $"n_chars" ||
      $"n_words" > $"n_tokens_bpe" || $"n_words" < 1).count() == 0)
    // training actually merged: compression below 1 token/char everywhere
    assert(out.filter($"tokens_per_char" >= 1.0).count() == 0)
    // the merges column pins the full trajectory: M entries, no sentinel
    // on this corpus, at least one multi-char (second-order) merge
    val merges = out.select($"merges").first.getString(0).split(";")
    assert(merges.length == Bpe.numMerges)
    assert(merges.forall(_.length >= 3), s"sentinel merge on a real corpus: ${merges.toSeq}")
    assert(merges.exists(_.length > 3), s"no second-order merges learned: ${merges.toSeq}")
    out.unpersist()
  }

  test("application plan is join-free per word and broadcasts the word table") {
    val p = Bpe.bpeTokenize.run(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), s"word->token-count join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
