package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Memo

/** Memo: the session-scoped derived-table cache. The r9 regression this
  * pins: builds are RE-ENTRANT (d10's canonical table builds the d3 pair
  * list inside its own build; c3 builds d10's), and the old
  * computeIfAbsent implementation threw "Recursive update" whenever the
  * inner entry was cold — masked for seven rounds by Verify's map
  * iteration order happening to warm the inner entries first.
  */
class MemoSpec extends AnyFunSuite with SparkTestKit {

  test("a cold build may recursively build another memo entry") {
    val df = Memo.cached(spark, sfDir, "memo-spec-outer") {
      val inner = Memo.cached(spark, sfDir, "memo-spec-inner") {
        spark.range(3).toDF()
      }
      inner.withColumnRenamed("id", "v")
    }
    assert(df.count() == 3)
    // both entries are now warm — rebuilds must not run (the build
    // closure would throw)
    val again = Memo.cached(spark, sfDir, "memo-spec-outer") {
      throw new IllegalStateException("outer rebuilt despite warm cache")
    }
    assert(again.count() == 3)
  }

  test("cachedValue is re-entrancy-safe and build-once") {
    var builds = 0
    val v = Memo.cachedValue(spark, sfDir, "memo-spec-val-outer") {
      builds += 1
      Memo.cachedValue(spark, sfDir, "memo-spec-val-inner") { 41 } + 1
    }
    assert(v == 42 && builds == 1)
    val v2 = Memo.cachedValue(spark, sfDir, "memo-spec-val-outer") {
      builds += 1; -1
    }
    assert(v2 == 42 && builds == 1, "warm value must not rebuild")
  }
}
