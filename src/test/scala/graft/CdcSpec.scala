package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Cdc

/** cdc1/cdc2 semantic gates beyond oracle parity (cdc2's oracle already
  * proves apply(previous, feed) ≡ current): the feed's classification
  * matches the snapshot construction exactly, and change types are
  * mutually exclusive per key.
  */
class CdcSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val feed = Cdc.cdc1SnapshotDiff.run(spark, sfDir).cache()

  test("classification matches the snapshot construction key-for-key") {
    val keys = Tables.orders(spark, sfDir).select($"o_orderkey").as[Long].collect().toSet
    val inserts = keys.filter(k => k % 97 == 0 && k % 101 != 0)
    val deletes = keys.filter(k => k % 101 == 0 && k % 97 != 0)
    val updates = keys.filter(k => k % 89 == 0 && k % 97 != 0 && k % 101 != 0)
    def got(t: String) =
      feed.filter($"change_type" === t).select($"o_orderkey").as[Long].collect().toSet
    assert(got("insert") == inserts)
    assert(got("delete") == deletes)
    assert(got("update") == updates)
  }

  test("one change per key, and update rows carry both images") {
    assert(feed.groupBy($"o_orderkey").count().filter($"count" > 1).count() == 0)
    val bad = feed.filter(
      ($"change_type" === "insert" && ($"old_price".isNotNull || $"new_price".isNull)) ||
      ($"change_type" === "delete" && ($"old_price".isNull || $"new_price".isNotNull)) ||
      ($"change_type" === "update" &&
        ($"old_price".isNull || $"new_price".isNull || $"old_price" === $"new_price")))
    assert(bad.count() == 0)
  }
}
