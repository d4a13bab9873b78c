package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Streaming near-dup screening gates: verdicts must equal a batch
  * recompute over everything ingested so far, intra-batch pairs resolve
  * deterministically, replay converges, and the probe stays an equi-join.
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // ten-word sentences so 3-gram shingles are plentiful; each seed gets a
  // DISJOINT vocabulary so unrelated docs share zero shingles and the
  // only near-dups are the explicit mutate() copies
  private def sentence(seed: Int): String =
    (0 until 10).map(i => s"s${seed}w$i").mkString(" ")
  private def mutate(s: String): String = {
    val w = s.split(" "); w(9) = "zzz"; w.mkString(" ")
  }

  test("stream screening equals batch recompute; intra-batch and cross-batch dups flagged") {
    val indexDir = tmp("nd-index") + "/index"
    val srcDir = tmp("nd-src")
    val verdictDir = tmp("nd-verdicts") + "/v"
    val ckpt = tmp("nd-ckpt")

    def run(): Unit = {
      val q = StreamingNearDup.sink(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id bigint, text string"))
          .json(srcDir),
        indexDir, verdictDir, ckpt).start()
      q.awaitTermination()
    }
    def verdicts(): Map[Long, (Boolean, Option[Long])] =
      spark.read.parquet(verdictDir)
        .select($"doc_id", $"is_near_dup", $"matched_doc")
        .collect().map(r => r.getLong(0) ->
          (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

    // batch 1: three originals + one intra-batch near-copy of doc 0
    Seq(
      (0L, sentence(1)), (1L, sentence(2)), (2L, sentence(3)),
      (3L, mutate(sentence(1)))
    ).toDF("doc_id", "text").write.mode("append").json(srcDir)
    run()
    val v1 = verdicts()
    assert(v1(0L) == (false, None) && v1(1L) == (false, None) && v1(2L) == (false, None))
    assert(v1(3L)._1 && v1(3L)._2.contains(0L), s"intra-batch near-dup missed: ${v1(3L)}")

    // batch 2: a cross-batch near-copy of doc 1, a fresh doc, and an
    // exact copy of doc 2
    Seq(
      (10L, mutate(sentence(2))), (11L, sentence(40)), (12L, sentence(3))
    ).toDF("doc_id", "text").write.mode("append").json(srcDir)
    run()
    val v2 = verdicts()
    assert(v2(10L)._1 && v2(10L)._2.contains(1L), s"cross-batch near-dup missed: ${v2(10L)}")
    assert(v2(11L) == (false, None))
    assert(v2(12L)._1 && v2(12L)._2.contains(2L), s"exact cross-batch dup missed: ${v2(12L)}")

    // equivalence: the streamed verdicts must match a batch recompute
    // over ALL docs — a doc is a near-dup iff it pairs (agreement ≥ 0.5)
    // with an earlier doc (doc_ids here encode arrival order)
    val all = Seq(
      (0L, sentence(1)), (1L, sentence(2)), (2L, sentence(3)), (3L, mutate(sentence(1))),
      (10L, mutate(sentence(2))), (11L, sentence(40)), (12L, sentence(3))
    ).toDF("doc_id", "text")
    val sigs = StreamingNearDup.signatures(all)
    val bands = StreamingNearDup.bandRows(sigs)
    val agree = (0 until graft.queries.Dedup.numHashes)
      .map(j => when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / graft.queries.Dedup.numHashes
    val expected = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("m"), agree.as("e"))
      .filter(col("e") >= 0.5)
      .groupBy($"doc_id").agg(min($"m").as("m"))
      .as[(Long, Long)].collect().toMap
    val streamed = verdicts()
    all.select($"doc_id").as[Long].collect().foreach { id =>
      assert(streamed(id)._1 == expected.contains(id),
        s"doc $id: streamed=${streamed(id)} expected match=${expected.get(id)}")
      expected.get(id).foreach(m => assert(streamed(id)._2.contains(m)))
    }

    // replay convergence: re-screening the last batch with ITS OWN
    // batchId must produce identical verdicts (the index already holds
    // that batch's rows — the screen must not match the batch to itself)
    val batch2 = Seq(
      (10L, mutate(sentence(2))), (11L, sentence(40)), (12L, sentence(3))
    ).toDF("doc_id", "text")
    val lastBatchId = spark.read.parquet(indexDir)
      .agg(max($"__batch")).as[Long].head()
    val replayed = StreamingNearDup.screenBatch(batch2, indexDir, lastBatchId)
      .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    assert(replayed == Map(10L -> true, 11L -> false, 12L -> true))

    // the probe plan stays an equi-join — no cartesian against history
    val p = StreamingNearDup.screenBatch(batch2, indexDir, lastBatchId)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup probe degenerated to a cartesian:\n$p")
  }

  test("replay after later batches landed must not see the future") {
    val indexDir = tmp("nd-future") + "/index"
    // batch 0: a clean original; batch 1: its near-copy (flagged).
    // Replaying batch 0 AFTER batch 1 landed (checkpoint recovery
    // mid-stream) must reproduce batch 0's original verdict — doc 0 clean —
    // not flag it against its own future copy.
    val b0 = Seq((0L, sentence(1))).toDF("doc_id", "text")
    val b1 = Seq((10L, mutate(sentence(1)))).toDF("doc_id", "text")
    val v0 = StreamingNearDup.screenBatch(b0, indexDir, 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v0 == Map(0L -> false))
    val v1 = StreamingNearDup.screenBatch(b1, indexDir, 1L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v1 == Map(10L -> true))
    val replayed = StreamingNearDup.screenBatch(b0, indexDir, 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(replayed == v0,
      s"replayed batch 0 saw the future: $replayed (history must be __batch < batchId)")
  }

  test("docs too short to shingle still get an explicit false verdict") {
    // <3 whitespace tokens → zero 3-gram shingles → no signature row.
    // The contract is one verdict row PER INPUT DOC, so these must come
    // back is_near_dup=false (not silently missing), while normal docs
    // in the same batch screen as usual.
    val indexDir = tmp("ndshort-index") + "/index"
    val batch = Seq(
      (0L, "tiny"), (1L, "two words"), (2L, sentence(7)), (3L, sentence(7))
    ).toDF("doc_id", "text")
    val v = StreamingNearDup.screenBatch(batch, indexDir, 0L)
      .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    assert(v.keySet == Set(0L, 1L, 2L, 3L), s"missing verdict rows: $v")
    assert(!v(0L) && !v(1L), "shingle-less docs must be is_near_dup=false")
    assert(!v(2L) && v(3L), "normal docs in the same batch must still screen")
    // and they are not in the index (nothing to probe against)
    assert(spark.read.parquet(indexDir).filter($"doc_id" < 2).count() == 0)
  }

  test("index compaction folds history, preserves verdicts, bounds files") {
    val indexDir = tmp("ndc-index") + "/index"
    // five batches of 40 docs; each batch after the first re-fetches 10
    // FRESH docs of the previous batch (deterministic exact dups — fresh
    // docs are those with i >= 10, whose text is sentence(their own id))
    def batchDf(b: Int) = (0 until 40).map { i =>
      val id = b * 100L + i
      if (b > 0 && i < 10) (id, sentence(((b - 1) * 100 + 20 + i).toInt))
      else (id, sentence(id.toInt))
    }.toDF("doc_id", "text")
    (0 until 5).foreach(b => StreamingNearDup.screenBatch(batchDf(b), indexDir, b.toLong).count())

    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partDirs = fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__batch=")).map(_.getPath.getName)
    // what a NEW probe sees: physical partitions minus pending-delete ones
    // (folded sources linger one compaction cycle for in-flight probes)
    def liveDirs = {
      val hist = StreamingNearDup.historyScan(spark, indexDir)
      hist.select($"__batch").distinct().as[Long].collect().map(b => s"__batch=$b")
    }
    assert(partDirs.length == 5)
    val before = spark.read.parquet(indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet

    // live batch = 5 (the next one); everything else folds into one part
    val (folded, _, filesAfter) = StreamingNearDup.compactIndex(spark, indexDir, 5L)
    assert(folded == 5 && filesAfter >= 1)
    assert(liveDirs.length == 1 && liveDirs.head.stripPrefix("__batch=").toLong < 0,
      s"got ${liveDirs.toSeq}")
    // folded sources still on disk (deferred), but excluded from probes
    assert(partDirs.length == 6, s"sources must linger one cycle: ${partDirs.toSeq}")
    // content identical (modulo the __batch bookkeeping column)
    assert(StreamingNearDup.historyScan(spark, indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet == before)

    // screening continues identically: batch 5 re-fetches from batch 4
    val v = StreamingNearDup.screenBatch(batchDf(5), indexDir, 5L)
      .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    (0 until 40).foreach { i =>
      assert(v(500L + i) == (i < 10), s"post-compaction verdict wrong for doc ${500 + i}")
    }
    // INCREMENTAL contract: one new small partition is not worth a
    // rewrite, and the consolidated partition is never re-folded below
    // the threshold — history stays untouched. This no-op call also
    // physically removes the previous fold's pending sources (their one
    // cycle of grace is over).
    assert(StreamingNearDup.compactIndex(spark, indexDir, 6L) == ((0, 0, 0)))
    assert(partDirs.length == 2, s"pending sources must be gone: ${partDirs.toSeq}")
    StreamingNearDup.screenBatch(batchDf(6), indexDir, 6L).count()
    val contentAll = spark.read.parquet(indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet
    val consolBefore = liveDirs.filter(_.stripPrefix("__batch=").toLong < 0).toSet
    // two small partitions (5, 6) fold into a NEW consolidated partition;
    // the big history partition is not rewritten
    val (folded2, _, _) = StreamingNearDup.compactIndex(spark, indexDir, 7L)
    assert(folded2 == 2, s"expected the two small partitions to fold, got $folded2")
    assert(liveDirs.length == 2 && consolBefore.subsetOf(liveDirs.toSet),
      s"history partition must survive an incremental fold: ${liveDirs.toSeq}")
    // past the threshold (2 consolidated partitions) a FULL refold merges
    // everything into one
    val (folded3, _, _) = StreamingNearDup.compactIndex(spark, indexDir, 7L, fullRefoldAt = 2)
    assert(folded3 == 2 && liveDirs.length == 1, s"full refold expected: ${liveDirs.toSeq}")
    assert(StreamingNearDup.historyScan(spark, indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet == contentAll)
    // idempotence: nothing left to fold (and the last pending set drains)
    assert(StreamingNearDup.compactIndex(spark, indexDir, 7L, fullRefoldAt = 2) == ((0, 0, 0)))
    assert(partDirs.length == 1, s"only the consolidated partition remains: ${partDirs.toSeq}")
  }

  test("a probe planned before compaction drains without error") {
    // the operational hazard compaction used to document: a probe whose
    // scan was PLANNED (file listing resolved) before the fold would hit
    // FileNotFoundException when the fold deleted its source partitions
    // mid-scan. Deferred deletion keeps those files for one full cycle:
    // the in-flight probe drains to the same rows, new probes skip the
    // pending partitions, and the next compaction reclaims the space.
    val indexDir = tmp("ndp-index") + "/index"
    def batchDf(b: Int) = (0 until 20).map { i =>
      val id = b * 100L + i; (id, sentence(id.toInt))
    }.toDF("doc_id", "text")
    (0 until 4).foreach(b => StreamingNearDup.screenBatch(batchDf(b), indexDir, b.toLong).count())

    // plan a probe-shaped scan NOW — spark.read.parquet snapshots the file
    // listing at plan time, exactly like an in-flight screenBatch
    val planned = spark.read.parquet(indexDir)
      .select($"doc_id", $"band_idx", $"band_key")
    val expected = planned.collect().toSet // also warms nothing: re-collected below

    val (folded, _, _) = StreamingNearDup.compactIndex(spark, indexDir, 4L)
    assert(folded == 4)
    // the pre-fold plan still finds every file and every row
    assert(planned.collect().toSet == expected)
    // a new probe reads each band row exactly once (pending dirs skipped)
    val hist = StreamingNearDup.historyScan(spark, indexDir)
    assert(hist.count() == expected.size, "new probes must not see duplicate rows")
    assert(hist.select($"doc_id", $"band_idx", $"band_key").collect().toSet == expected)
    // screening itself stays correct across the pending window: an exact
    // re-fetch of a folded doc is still flagged against the consolidated rows
    val refetch = Seq((900L, sentence(5))).toDF("doc_id", "text") // copy of doc 5
    val v = StreamingNearDup.screenBatch(refetch, indexDir, 4L)
      .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    assert(v(900L), "probe against consolidated history must still match")
    // next maintenance pass reclaims the space
    StreamingNearDup.compactIndex(spark, indexDir, 5L)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val physical = fs.listStatus(new org.apache.hadoop.fs.Path(indexDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__batch=")).map(_.getPath.getName)
    assert(!physical.exists(n => (0 until 4).map(b => s"__batch=$b").contains(n)),
      s"folded sources must be reclaimed at the next pass: ${physical.toSeq}")
  }

  test("a manifest whose consolidated target never landed is inert") {
    // crash window: compact writes the manifest BEFORE the publish
    // rename. If the rename never happens, the pending sources are still
    // the only copy — scan must keep reading them, and the next compact
    // must clear the stale manifest and redo the fold.
    val indexDir = tmp("ndm-index") + "/index"
    def batchDf(b: Int) = (0 until 10).map { i =>
      val id = b * 100L + i; (id, sentence(id.toInt))
    }.toDF("doc_id", "text")
    (0 until 3).foreach(b => StreamingNearDup.screenBatch(batchDf(b), indexDir, b.toLong).count())
    val all = spark.read.parquet(indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet

    // simulate the crash: manifest names a target that was never renamed in
    val (fs, root) = PartitionedIndex.fsFor(spark, indexDir)
    PartitionedIndex.writeManifest(fs, root, Some(
      PartitionedIndex.Manifest("__batch=-99",
        Seq("__batch=0", "__batch=1", "__batch=2"))))

    // scan ignores the inert manifest — every row still visible
    assert(StreamingNearDup.historyScan(spark, indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet == all,
      "an unpublished fold must not hide the live source partitions")
    // and screening still works against the full history
    val v = StreamingNearDup.screenBatch(
      Seq((900L, sentence(105))).toDF("doc_id", "text"), indexDir, 3L)
      .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().head
    assert(v._2, "probe against manifest-shadowed history must still match")

    // the next compact clears the stale manifest and folds for real
    // (batches 0-2 plus the just-written batch 3)
    val (folded, _, _) = StreamingNearDup.compactIndex(spark, indexDir, 4L)
    assert(folded == 4, s"expected a real refold after the stale manifest, got $folded")
    val after = StreamingNearDup.historyScan(spark, indexDir)
      .select($"doc_id", $"band_idx", $"band_key").collect().toSet
    assert(all.subsetOf(after) && after.exists(_.getLong(0) == 900L)
      && after.size > all.size, "refold must preserve history plus batch 3")
  }

  test("soak: heavy-dup batches against a growing index stay bounded") {
    // three 5k-doc batches, each 50% exact re-fetches of earlier docs
    // (the adversarial live-intake shape: a crawler re-crawling known
    // pages). Exact copies have jaccard 1 → every band matches, so the
    // flag is deterministic (a MUTATED copy at jaccard ≈ 0.78 has ~75%
    // LSH recall with 3 bands of 4 — the single-mutation case above is
    // the probe-correctness test, this one is the scale soak). Guards
    // the Σ|bucket|² probe bound via a wall limit.
    val indexDir = tmp("nds-index") + "/index"
    def batchDf(b: Int) = {
      val rows = (0 until 5000).map { i =>
        val id = b * 5000L + i
        // even i: fresh doc with its own vocabulary; odd i: exact copy of
        // the fresh doc one position earlier (previous batch when b > 0)
        if (i % 2 == 0) (id, sentence(id.toInt))
        else {
          val srcId = if (b > 0) (b - 1) * 5000L + (i - 1) else id - 1
          (id, sentence(srcId.toInt))
        }
      }
      rows.toDF("doc_id", "text")
    }
    val t0 = System.nanoTime()
    val verdicts = (0 until 3).map { b =>
      StreamingNearDup.screenBatch(batchDf(b), indexDir, b.toLong)
        .select($"doc_id", $"is_near_dup").as[(Long, Boolean)].collect().toMap
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(wallSec < 120.0, f"streaming near-dup soak took $wallSec%.0f s — probe not bounded")
    // every engineered near-copy flagged; fresh docs in batch 0 clean
    verdicts.zipWithIndex.foreach { case (v, b) =>
      val odd = v.filter(_._1 % 2 == 1)
      assert(odd.values.forall(identity), s"batch $b missed near-copies")
      if (b == 0) assert(v.filter(_._1 % 2 == 0).values.forall(!_),
        "batch 0 fresh docs falsely flagged")
    }
  }
}
