package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingMv: retractable MV maintenance from a change-feed stream.
  *  - view after N micro-batches ≡ a full GROUP BY over the final
  *    logical table (the mv3 contract, streamed);
  *  - at-least-once replay converges for BOTH paths (merge-path groups
  *    are fenced by __last_batch into the idempotent recompute);
  *  - a group retracted to empty loses its view partition;
  *  - an update that moves a row between groups retracts and adds;
  *  - compactLog leaves the view identical and replays of folded
  *    batches lose the LWW race instead of double-counting.
  */
class StreamingMvSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val ddl = "key BIGINT, change_type STRING, old_grp BIGINT, " +
    "old_cents BIGINT, new_grp BIGINT, new_cents BIGINT"

  private type FeedRow = (Long, String, Option[Long], Option[Long], Option[Long], Option[Long])

  private def feedDf(rows: FeedRow*): DataFrame =
    rows.toDF("key", "change_type", "old_grp", "old_cents", "new_grp", "new_cents")

  private def ins(k: Long, g: Long, c: Long): FeedRow =
    (k, "insert", None, None, Some(g), Some(c))
  private def upd(k: Long, og: Long, oc: Long, ng: Long, nc: Long): FeedRow =
    (k, "update", Some(og), Some(oc), Some(ng), Some(nc))
  private def del(k: Long, g: Long, c: Long): FeedRow =
    (k, "delete", Some(g), Some(c), None, None)

  /** Ground truth: replay the feeds over a key→(grp, cents) map, then
    * aggregate — what the maintained view must equal.
    */
  private def expectView(feeds: Seq[Seq[FeedRow]]): Seq[(Long, Long, Long, Long, Long)] = {
    val state = scala.collection.mutable.Map[Long, (Long, Long)]()
    feeds.flatten.foreach {
      case (k, "delete", _, _, _, _) => state.remove(k)
      case (k, _, _, _, Some(g), Some(c)) => state(k) = (g, c)
      case r => fail(s"malformed feed row $r")
    }
    state.values.groupBy(_._1).map { case (g, rows) =>
      val cents = rows.map(_._2).toSeq
      (g, cents.size.toLong, cents.sum, cents.min, cents.max)
    }.toSeq.sortBy(_._1)
  }

  private def viewOf(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    StreamingMv.view(spark, dir)
      .select($"grp", $"n_rows", $"sum_cents", $"min_cents", $"max_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  private def process(dir: String, batchId: Long, rows: FeedRow*): Unit =
    StreamingMv.processBatch(spark, feedDf(rows: _*), batchId, dir)

  test("N batches of inserts/updates/deletes equal the full rebuild") {
    val dir = tmp("mv-store")
    val b0 = Seq(ins(1, 10, 100), ins(2, 10, 300), ins(3, 20, 50))
    val b1 = Seq(upd(2, 10, 300, 10, 250), ins(4, 20, 75))   // in-group update
    val b2 = Seq(del(3, 20, 50), ins(5, 30, 999))            // delete + new group
    process(dir, 0, b0: _*); process(dir, 1, b1: _*); process(dir, 2, b2: _*)
    assert(viewOf(dir) == expectView(Seq(b0, b1, b2)))
  }

  test("replay converges: completed batches are fence-skipped, even dead-group inserts") {
    val dir = tmp("mv-replay")
    val b0 = Seq(ins(1, 10, 100), ins(2, 20, 40))
    val b1 = Seq(ins(3, 10, 7), del(2, 20, 40))  // grp 10 merge path, grp 20 recompute
    process(dir, 0, b0: _*); process(dir, 1, b1: _*)
    val settled = viewOf(dir)
    process(dir, 1, b1: _*)            // replay last batch
    assert(viewOf(dir) == settled)
    // replay an EARLIER batch whose group 20 insert would — without the
    // global fence — resurrect the dead group through the merge path
    process(dir, 0, b0: _*)
    assert(viewOf(dir) == settled)
    assert(settled == expectView(Seq(b0, b1)))
  }

  test("crash-retry (fence write lost): per-row fence routes published groups to recompute") {
    val dir = tmp("mv-crash")
    val b0 = Seq(ins(1, 10, 100))
    val b1 = Seq(ins(2, 10, 7), ins(3, 20, 40))  // both groups merge path
    process(dir, 0, b0: _*); process(dir, 1, b1: _*)
    val settled = viewOf(dir)
    // simulate: batch 1 published its view rows but crashed BEFORE the
    // global fence advanced — roll the fence back and re-run the batch
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingMv.writeFence(fs, dir, 0L)
    process(dir, 1, b1: _*)
    assert(viewOf(dir) == settled, "crash-retry double-merged a published group")
  }

  test("a group retracted to empty loses its view partition") {
    val dir = tmp("mv-empty")
    process(dir, 0, ins(1, 10, 100), ins(2, 20, 5))
    process(dir, 1, del(2, 20, 5))
    assert(viewOf(dir).map(_._1) == Seq(10L))
  }

  test("an update moving a row between groups retracts and adds") {
    val dir = tmp("mv-move")
    val b0 = Seq(ins(1, 10, 100), ins(2, 10, 60))
    val b1 = Seq(upd(2, 10, 60, 20, 61))
    process(dir, 0, b0: _*); process(dir, 1, b1: _*)
    assert(viewOf(dir) == expectView(Seq(b0, b1)))
    assert(viewOf(dir) == Seq((10L, 1L, 100L, 100L, 100L), (20L, 1L, 61L, 61L, 61L)))
  }

  test("compactLog preserves the view; folded-batch replay is fence-skipped") {
    val dir = tmp("mv-compact")
    val b0 = Seq(ins(1, 10, 100), ins(2, 10, 300))
    val b1 = Seq(upd(1, 10, 100, 10, 120), del(2, 10, 300))
    process(dir, 0, b0: _*); process(dir, 1, b1: _*)
    val settled = viewOf(dir)
    StreamingMv.compactLog(spark, dir)
    assert(viewOf(dir) == settled)
    // replaying a folded batch must not resurrect key 2 or re-count key 1
    // (it would re-write adds whose later retracts were folded away — the
    // fence skips it before the log is touched)
    process(dir, 0, b0: _*)
    assert(viewOf(dir) == settled)
    // and the store still maintains correctly after compaction, including
    // a retraction that forces a recompute over the FOLDED log
    val b2 = Seq(ins(6, 10, 1), del(1, 10, 120))
    process(dir, 2, b2: _*)
    assert(viewOf(dir) == expectView(Seq(b0, b1, b2)))
  }

  test("cdc1's real snapshot diff drives the MV to the current snapshot") {
    // the two halves must speak the same dialect: batch cdc1 produces the
    // change feed, StreamingMv consumes it — seed the view from the
    // previous snapshot, apply the diff, land exactly on a full rebuild
    // of the current snapshot (mv3's oracle, live)
    import org.apache.spark.sql.functions._
    val dir = tmp("mv-cdc")
    val (previous, current) = graft.queries.Cdc.snapshots(spark, "/root/testdata/sf0.001")
    def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
      $"o_orderkey".as("key"),
      substring($"priority", 1, 1).cast("bigint").as("grp"),
      ($"price" * 100).cast("bigint").as("cents"))
    val prev = shaped(previous); val cur = shaped(current)
    // batch 0: the previous snapshot arrives as pure inserts
    val seed = prev.select($"key", lit("insert").as("change_type"),
      lit(null).cast("bigint").as("old_grp"), lit(null).cast("bigint").as("old_cents"),
      $"grp".as("new_grp"), $"cents".as("new_cents"))
    StreamingMv.processBatch(spark, seed, 0L, dir)
    // batch 1: the cdc1-shaped diff (full-outer, insert/update/delete)
    val p = prev.as("p"); val c = cur.as("c")
    val feed = p.join(c, col("p.key") === col("c.key"), "full_outer")
      .filter(col("p.key").isNull || col("c.key").isNull
        || col("p.cents") =!= col("c.cents") || col("p.grp") =!= col("c.grp"))
      .select(coalesce(col("p.key"), col("c.key")).as("key"),
        when(col("p.key").isNull, "insert")
          .when(col("c.key").isNull, "delete").otherwise("update").as("change_type"),
        col("p.grp").as("old_grp"), col("p.cents").as("old_cents"),
        col("c.grp").as("new_grp"), col("c.cents").as("new_cents"))
    StreamingMv.processBatch(spark, feed, 1L, dir)
    val want = cur.groupBy($"grp").agg(
        count(lit(1)).as("n"), sum($"cents").as("s"),
        min($"cents").as("mn"), max($"cents").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(viewOf(dir) == want)
  }

  test("file-source stream across two runs equals the rebuild (checkpointed sink)") {
    val srcDir = tmp("mv-src"); val dir = tmp("mv-sink"); val ckpt = tmp("mv-ckpt")
    val b0 = Seq(ins(1, 10, 100), ins(2, 20, 40), ins(3, 20, 90))
    feedDf(b0: _*).write.mode("append").json(srcDir)
    def run(): Unit = {
      val q = StreamingMv.mvSink(
        spark.readStream.schema(StructType.fromDDL(ddl)).json(srcDir), dir, ckpt).start()
      q.awaitTermination()
    }
    run()
    val b1 = Seq(del(3, 20, 90), upd(1, 10, 100, 10, 110), ins(4, 30, 5))
    feedDf(b1: _*).write.mode("append").json(srcDir)
    run()
    assert(viewOf(dir) == expectView(Seq(b0, b1)))
  }
}
