package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared machinery for batch-partitioned on-disk indexes — the storage
  * contract behind the streaming screens ([[StreamingNearDup]],
  * [[StreamingSemDedup]]): one `__batch=N` parquet partition per
  * micro-batch (dynamic overwrite → replay-idempotent appends), probes
  * that read the whole history, and a maintenance fold that consolidates
  * the per-batch partitions without ever breaking an in-flight probe.
  *
  * DEFERRED DELETION is the concurrency story: a fold never deletes the
  * partitions it consolidated. It lists them in a `_graft_pending_delete`
  * manifest (published write-then-rename, so never torn) and the NEXT
  * fold removes them — one full compaction cycle of grace. A probe that
  * planned its scan before the fold keeps every file it resolved; probes
  * planned after go through [[scan]], which skips pending partitions so
  * no row is read twice. The only unprotected shape is a single probe
  * spanning two entire compaction cycles.
  */
object PartitionedIndex {

  private[streaming] val pendingFile = "_graft_pending_delete"

  private[streaming] def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val root = new Path(dir)
    (root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Manifest contents: the consolidated dir the pending partitions were
    * folded into, plus the pending dir names. The target is what makes
    * the manifest TRANSACTIONAL: it is written BEFORE the consolidated
    * partition is renamed into place, and readers honor the pending list
    * only once that target dir exists — so there is never a window where
    * a scan sees the folded rows twice (manifest live + target live) or
    * not at all (manifest honored while the copy is still being staged).
    */
  private[streaming] final case class Manifest(target: String, pending: Seq[String])

  private[streaming] def readManifest(fs: FileSystem, root: Path): Option[Manifest] = {
    val p = new Path(root, pendingFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
      lines match {
        case head :: rest if head.startsWith("target=") =>
          Some(Manifest(head.stripPrefix("target="), rest))
        case _ => None // torn/foreign content — ignore, never guess
      }
    }
  }

  /** The pending set a reader must honor: only once the fold's target
    * partition is live; a manifest whose target never landed (crash
    * between manifest write and publish) is inert.
    */
  private[streaming] def livePending(fs: FileSystem, root: Path): Set[String] =
    readManifest(fs, root) match {
      case Some(m) if fs.exists(new Path(root, m.target)) => m.pending.toSet
      case _ => Set.empty
    }

  /** Force the deferred deletion to COMPLETE now: physically remove the
    * pending partitions (their rows already live in the consolidated
    * target) and clear the manifest; an inert manifest (target never
    * landed — crash between manifest write and publish) is just cleared,
    * its sources being the live data. This is [[compact]]'s preamble,
    * exposed because PHYSICAL-ERASURE passes (e.g.
    * [[StreamingIvf.purgeRetracted]]) must run it too: a pending-aware
    * scan skips folded-but-undeleted partitions, so an erasure that only
    * rewrites what it scans would leave the erased bytes sitting in the
    * pending dirs — reported gone, still on disk. Quiescent-point
    * operation: it spends the one-compaction-cycle grace probes get.
    */
  private[streaming] def settlePending(fs: FileSystem, root: Path): Unit =
    readManifest(fs, root).foreach { m =>
      if (fs.exists(new Path(root, m.target)))
        m.pending.foreach(n => fs.delete(new Path(root, n), true))
      writeManifest(fs, root, None)
    }

  private[streaming] def writeManifest(fs: FileSystem, root: Path,
      m: Option[Manifest]): Unit = {
    val target = new Path(root, pendingFile)
    m match {
      case None => fs.delete(target, false)
      case Some(mm) =>
        // write-then-rename so a reader never sees a torn manifest
        val tmp = new Path(root, pendingFile + ".tmp")
        val out = fs.create(tmp, true)
        try out.write((s"target=${mm.target}\n" + mm.pending.mkString("\n") + "\n")
          .getBytes("UTF-8"))
        finally out.close()
        fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new IllegalStateException(s"index consolidation: could not publish $target")
    }
  }

  /** Pending-aware history read: every `__batch=` partition except those
    * marked for deferred deletion (their rows already live in a
    * consolidated partition — reading them would duplicate). Returns None
    * when the index has no live partitions yet (callers supply their own
    * empty-schema frame).
    */
  def scan(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val (fs, root) = fsFor(spark, indexDir)
    if (!fs.exists(root)) return None
    val pending = livePending(fs, root)
    // dataless dirs (a consolidated partition whose fold input was
    // entirely filtered away keeps only its _SUCCESS marker) would break
    // schema inference — and carry no rows to read anyway
    def hasParquet(p: Path): Boolean = {
      val it = fs.listFiles(p, true)
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) return true
      false
    }
    val dirs = fs.listStatus(root).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("__batch=") && !pending(s.getPath.getName) &&
      hasParquet(s.getPath))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", indexDir)
      .parquet(dirs.map(_.getPath.toString).toIndexedSeq: _*))
  }

  /** Fold historical `__batch=N` partitions into one consolidated
    * partition (fresh NEGATIVE id so it never collides with a real
    * batchId). Incremental: consolidated partitions are only re-folded
    * once `fullRefoldAt` small or consolidated partitions have
    * accumulated, so steady-state calls rewrite only the new batches.
    * The live batch's partition is never touched. `dedupKeys` heal the
    * duplicate rows a crash between publish and manifest write can leave
    * (the keys that identify one index row).
    *
    * `dedupOrder`: which copy survives when duplicates ARE found. Empty
    * (default) = arbitrary keep (fine when every copy is byte-identical,
    * the crash-duplicate shape for plain appends). Non-empty = keep the
    * FIRST row per key under this ordering — required when copies can
    * legitimately DIFFER (e.g. a splitCell crash leaves a vector under
    * both the retired cell_id and its new sub-cell: an arbitrary keep
    * could retain the copy no live codebook plans, silently hiding the
    * vector from pruned probes). The caller must make the ordering total
    * over its duplicate shapes or the keep is still arbitrary within ties.
    *
    * `foldFilter` (default identity) transforms the fold's INPUT before
    * dedup — the hook retraction-aware maintenance uses to drop
    * logically-erased rows during the consolidation rewrite itself
    * instead of paying a second rewrite of the same partitions
    * ([[StreamingIvf.compactAndPurge]]). The filter must be stable for
    * the duration of the fold (quiescent-point contract).
    *
    * Returns (partitions folded, files before, files after).
    */
  def compact(spark: SparkSession, indexDir: String, liveBatchId: Long,
      dedupKeys: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024,
      fullRefoldAt: Int = 16,
      partitionCols: Seq[String] = Nil,
      dedupOrder: Seq[org.apache.spark.sql.Column] = Nil,
      foldFilter: DataFrame => DataFrame = identity): (Int, Int, Int) = {
    val (fs, root) = fsFor(spark, indexDir)
    if (!fs.exists(root)) return (0, 0, 0)
    val tmp = new Path(indexDir + ".consolidate.tmp")
    fs.delete(tmp, true)

    // the previous fold's sources have now survived one full cycle — any
    // probe planned over them has long finished; physically delete them.
    settlePending(fs, root)

    def partDirs = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("__batch="))
    // recursive: indexes that keep a secondary partition layout
    // (`partitionCols`, e.g. cell_id=X subdirs) nest their files
    def files(p: Path): Int = {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val nonLive = partDirs.filter(_.getPath.getName != s"__batch=$liveBatchId")
    def id(s: org.apache.hadoop.fs.FileStatus): Long =
      s.getPath.getName.stripPrefix("__batch=").toLong
    val (consolidated, smalls) = nonLive.partition(id(_) < 0L)
    val folds =
      if (smalls.length >= fullRefoldAt || consolidated.length >= fullRefoldAt) nonLive
      else smalls
    if (folds.length <= 1) return (0, 0, 0)
    val filesBefore = folds.map(s => files(s.getPath)).sum
    val bytes = folds.map(s => fs.getContentSummary(s.getPath).getLength).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // below EVERY existing partition id (folded or not), so untouched
    // consolidated partitions can never collide with the new one
    val freshId = math.min(nonLive.map(id).min, 0L) - 1L

    // with partitionCols (e.g. cell_id): the nested `cell_id=X` layout
    // makes multi-root partition discovery conflict, so anchor it with
    // basePath (then drop the __batch dir column — the consolidated
    // partition gets its batch id from its own dir name); the repartition
    // keys on the partition cols so each value's rows land in few files,
    // and partitionBy preserves the directory layout probes prune on
    val raw = foldFilter(if (partitionCols.isEmpty)
        spark.read.parquet(folds.map(_.getPath.toString).toIndexedSeq: _*)
      else spark.read.option("basePath", root.toString)
        .parquet(folds.map(_.getPath.toString).toIndexedSeq: _*)
        .drop("__batch"))
    val deduped =
      if (dedupOrder.isEmpty) raw.dropDuplicates(dedupKeys)
      else {
        import org.apache.spark.sql.functions.{col, row_number}
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(dedupKeys.map(col): _*).orderBy(dedupOrder: _*)
        raw.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      }
    val shaped =
      if (partitionCols.isEmpty) deduped.repartition(n)
      else deduped.repartition(n, partitionCols.map(org.apache.spark.sql.functions.col): _*)
    val writer = shaped.write.mode("overwrite")
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(tmp.toString)
    val target = new Path(root, s"__batch=$freshId")
    // manifest FIRST (inert until the target lands), then the publish
    // rename — the pending exclusion and the consolidated partition
    // become visible to readers in the same atomic step
    writeManifest(fs, root,
      Some(Manifest(target.getName, folds.map(_.getPath.getName).toIndexedSeq)))
    // Two concurrent compacts list the same partitions → same freshId and
    // an identical fold (same sources, same dedup). The loser must stand
    // down WITHOUT clearing the winner's just-published manifest (that
    // would re-expose the folded sources next to the consolidated
    // partition). Two loss shapes: rename returns false, or Hadoop
    // "succeeds" by nesting our tmp INSIDE the winner's existing target.
    val renamed = fs.rename(tmp, target)
    val nested = new Path(target, tmp.getName)
    if (renamed && fs.exists(nested)) {
      fs.delete(nested, true) // winner's content is identical; drop ours
    } else if (!renamed) {
      // do NOT clear the manifest here: if a winner published, the
      // manifest is live and belongs to its fold; if nobody did, the
      // manifest is inert (target absent → livePending ignores it) and
      // the next compact's preamble clears and redoes it
      fs.delete(tmp, true)
      if (!fs.exists(target))
        throw new IllegalStateException(s"index consolidation: could not publish $target")
    }
    (folds.length, filesBefore, files(target))
  }
}
