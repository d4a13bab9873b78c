package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** PlannedJoin — the armed pricers. Contracts:
  *  - the CHOICE matches the advisor's verdict on tiny / uniform /
  *    skewed / over-cap fixtures (broadcast, shuffle, salted, fail-loud);
  *  - every strategy returns the SAME multiset as the plain equi-join
  *    (the property that makes automating the choice safe);
  *  - the broadcast choice actually plans a broadcast join;
  *  - the fail-loud path names the levers;
  *  - the price itself is exact (Σ cA·cB, hottest key, matched keys).
  */
class PlannedJoinSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.mkString("|")).groupBy(identity).view.mapValues(_.length).toMap

  private def assertSameAsPlain(a: DataFrame, b: DataFrame, keys: Seq[String],
      got: DataFrame, joinType: String = "inner"): Unit = {
    val want = a.join(b, keys, joinType)
    assert(multiset(got.select(want.columns.map(col): _*)) == multiset(want))
  }

  // uniform fixture: 200 keys × small degrees, payload padded past any
  // tiny threshold the test passes
  private def uniformA = (0 until 400).map(i => (i % 200, s"a$i" * 8)).toDF("k", "pa")
  private def uniformB = (0 until 600).map(i => (i % 200, s"b$i" * 8)).toDF("k", "pb")

  test("tiny side → broadcast, and the plan really broadcasts") {
    val a = uniformA
    val b = (0 until 10).map(i => (i, s"dim$i")).toDF("k", "name")
    val (joined, s, p) = PlannedJoin.join(a, b, Seq("k"))
    assert(s == PlannedJoin.Broadcast("b"), s"got $s from $p")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assertSameAsPlain(a, b, Seq("k"), joined)
  }

  test("uniform keys past the broadcast line → plain shuffle (don't decorate the right plan)") {
    val (joined, s, p) = PlannedJoin.join(uniformA, uniformB, Seq("k"),
      broadcastBytes = 0L)
    assert(s == PlannedJoin.Shuffle, s"got $s from $p")
    // exact pricing: every key matches, degree 2 × 3
    assert(p.matchedKeys == 200 && p.outRows == BigInt(200 * 2 * 3))
    assert(p.maxKeyProd == BigInt(6) && p.topKeyPpm == (BigInt(6) * 1000000 / 1200).toLong)
    assertSameAsPlain(uniformA, uniformB, Seq("k"), joined)
  }

  test("one key owning the output → salted, multiset-identical to the plain join") {
    // key 0 carries 300×300 of the output; 50 tail keys carry 1×1 each
    val a = ((0 until 300).map(_ => (0, "hotA")) ++
      (1 to 50).map(i => (i, s"a$i"))).toDF("k", "pa")
    val b = ((0 until 300).map(_ => (0, "hotB")) ++
      (1 to 50).map(i => (i, s"b$i"))).toDF("k", "pb")
    val (joined, s, p) = PlannedJoin.join(a, b, Seq("k"), broadcastBytes = 0L)
    assert(p.outRows == BigInt(300 * 300 + 50))
    assert(p.topKeyPpm > 990000L, s"fixture should be ~all one key: $p")
    s match {
      case PlannedJoin.Salted(n) => assert(n >= 2)
      case other => fail(s"expected Salted, got $other from $p")
    }
    assertSameAsPlain(a, b, Seq("k"), joined)
  }

  test("priced past the cap → fail loud, naming the levers (no shuffle ever runs)") {
    val a = ((0 until 300).map(_ => (0, "hotA")) ++
      (1 to 50).map(i => (i, s"a$i"))).toDF("k", "pa")
    val b = ((0 until 300).map(_ => (0, "hotB")) ++
      (1 to 50).map(i => (i, s"b$i"))).toDF("k", "pb")
    val err = intercept[IllegalStateException] {
      PlannedJoin.join(a, b, Seq("k"), broadcastBytes = 0L, cap = 1000L)
    }
    assert(err.getMessage.contains("pre-aggregate") &&
      err.getMessage.contains("frequency-cap"))
  }

  test("left join: preserved side never broadcasts; unmatched rows survive every strategy") {
    val a = ((0 until 20).map(i => (i, s"a$i"))).toDF("k", "pa") // smaller than b, but preserved
    val b = (10 until 400).map(i => (i % 50 + 10, s"b$i" * 16)).toDF("k", "pb")
    val (joined, s, p) = PlannedJoin.join(a, b, Seq("k"), joinType = "left")
    // a is the smaller side but a LEFT join preserves it — the advisor
    // itself must name b (choose is joinType-aware; r12 ADVICE)
    assert(s == PlannedJoin.Broadcast("b"), s"got $s from $p")
    // left-aware pricing: keys 0..9 of a are unmatched → counted in outRows
    val innerOut = a.join(b, Seq("k")).count()
    assert(p.outRows == BigInt(innerOut + 10), s"got $p")
    assertSameAsPlain(a, b, Seq("k"), joined, "left")
    // salted left join too
    val hotB = ((0 until 300).map(_ => (0, "hot")) ++ (1 to 50).map(i => (i, s"b$i")))
      .toDF("k", "pb")
    val hotA = ((0 until 300).map(_ => (0, "hot")) ++ (51 to 60).map(i => (i, s"a$i")))
      .toDF("k", "pa")
    val (lj, ls, lp) = PlannedJoin.join(hotA, hotB, Seq("k"),
      joinType = "left", broadcastBytes = 0L)
    assert(ls.isInstanceOf[PlannedJoin.Salted], s"got $ls from $lp")
    assertSameAsPlain(hotA, hotB, Seq("k"), lj, "left")
  }

  test("cap beats broadcast: a broadcastable side over-cap-fanning fails loud (r12 VERDICT #2)") {
    // b fits any broadcast threshold, but key 0's fanout prices past the
    // cap — the old order broadcast silently and the explosion landed on
    // the consumer; the cap must fire first, naming broadcast's futility
    val a = (0 until 500).map(_ => (0, "hotA")).toDF("k", "pa")
    val b = (0 until 500).map(_ => (0, "hotB")).toDF("k", "pb")
    val err = intercept[IllegalStateException] {
      PlannedJoin.join(a, b, Seq("k"), broadcastBytes = Long.MaxValue, cap = 1000L)
    }
    assert(err.getMessage.contains("broadcast would dodge the shuffle") &&
      err.getMessage.contains("pre-aggregate"))
  }

  test("left join with unbroadcastable b falls through to the priced paths, not a silent shuffle") {
    // hot key + b past the threshold: the old executor fell back to a
    // plain shuffle with the skew verdict never consulted — now choose
    // itself (joinType-aware) lands on Salted
    val a = ((0 until 300).map(_ => (0, "hotA")) ++ (1 to 50).map(i => (i, s"a$i")))
      .toDF("k", "pa")
    val b = ((0 until 300).map(_ => (0, "hotB")) ++ (1 to 50).map(i => (i, s"b$i")))
      .toDF("k", "pb")
    val p = PlannedJoin.price(a, b, Seq("k"), "left")
    val s = PlannedJoin.choose(p, broadcastBytes = 0L, joinType = "left")
    assert(s.isInstanceOf[PlannedJoin.Salted], s"got $s from $p")
    // and over-cap left joins fail loud instead of shuffling
    intercept[IllegalStateException] {
      PlannedJoin.choose(p, broadcastBytes = 0L, cap = 1000L, joinType = "left")
    }
  }

  test("unsupported join types fail loud at entry (salting would replicate the build side)") {
    val a = Seq((1, "a")).toDF("k", "pa")
    val b = Seq((1, "b")).toDF("k", "pb")
    for (jt <- Seq("right", "full", "left_semi", "left_anti")) {
      val err = intercept[IllegalArgumentException] {
        PlannedJoin.join(a, b, Seq("k"), joinType = jt)
      }
      assert(err.getMessage.contains("inner") && err.getMessage.contains(jt))
    }
  }

  test("empty sides price to zeros (no NPE) and still execute correctly") {
    val a = Seq((1, "a"), (2, "aa")).toDF("k", "pa")
    val empty = Seq.empty[(Int, String)].toDF("k", "pb")
    val pInner = PlannedJoin.price(a, empty, Seq("k"))
    assert(pInner.nB == 0L && pInner.outRows == BigInt(0) && pInner.topKeyPpm == 0L)
    val (ji, _, _) = PlannedJoin.join(a, empty, Seq("k"))
    assert(ji.count() == 0L)
    // left join with empty b: outRows = nA (all preserved, unmatched)
    val pLeft = PlannedJoin.price(a, empty, Seq("k"), "left")
    assert(pLeft.outRows == BigInt(2))
    val (jl, _, _) = PlannedJoin.join(a, empty, Seq("k"), joinType = "left")
    assertSameAsPlain(a, empty, Seq("k"), jl, "left")
    // both empty
    val pBoth = PlannedJoin.price(empty.toDF("k", "pa"), empty, Seq("k"))
    assert(pBoth.outRows == BigInt(0) && pBoth.nA == 0L)
  }
}
