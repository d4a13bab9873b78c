package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the maintenance
  * pass every streaming sink needs: micro-batches append one file per
  * trigger per partition, and a month of 60 s triggers is ~43k files whose
  * open/footer costs dominate scans long before data size does.
  *
  * Strategy: size the target file count from the directory's actual bytes
  * (`ceil(bytes / targetFileBytes)`), rewrite with `repartition(n)`, then
  * swap directories (write to `<dir>.compact.tmp`, rename the old dir
  * away, rename the new one in, drop the old; failed swap rolls back).
  * Readers never see a MIXED layout, but the swap is two renames — a
  * reader in the instant between them sees a missing directory, so run it
  * in the partition's maintenance window (cold partitions only) or behind
  * a catalog pointer swap. Content is byte-equal rows — only the file
  * layout changes.
  *
  * Crash recovery: a crash between the two renames leaves `<dir>` missing
  * with the only data copy in `<dir>.compact.old`. `compact` detects that
  * state at entry and restores the directory before proceeding, so simply
  * re-running it recovers (manual recovery, should it ever be needed:
  * rename `<dir>.compact.old` back to `<dir>`, delete `<dir>.compact.tmp`).
  * A crash after the swap but before cleanup leaves a stale `.compact.old`
  * next to a live `<dir>`; that copy is dropped at the next run's entry.
  *
  * Scale notes: at 100 TB run this per PARTITION directory (month_key=…)
  * after the partition goes cold — each compaction is then an independent,
  * idempotent, partition-sized job. The rewrite is one shuffle-free scan
  * when coalescing down (repartition used deliberately: it rebalances
  * skewed micro-batch files instead of concatenating them unevenly).
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int, bytes: Long)

  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Stats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery (see scaladoc): a previous run that died between its
    // two swap renames left the only data copy in .compact.old — restore
    // it before doing anything else
    val staleOld = new Path(dir + ".compact.old")
    if (fs.exists(staleOld) && !fs.exists(path)) {
      if (!fs.rename(staleOld, path))
        throw new IllegalStateException(
          s"compaction: found interrupted swap but could not restore $staleOld to $dir")
    }
    val entries = fs.listStatus(path)
    // refuse a partitioned table ROOT: compacting through it would funnel
    // the whole table into one write AND flatten the key=value directory
    // layout (losing partition pruning). Callers compact leaf partitions.
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"compaction target $dir contains subdirectories (${subdirs.take(3).mkString(", ")}…) — " +
        "compact each partition directory individually")
    val parquetFiles = entries.filter(_.getPath.getName.endsWith(".parquet"))
    val bytes = parquetFiles.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val tmp = new Path(dir + ".compact.tmp")
    val old = new Path(dir + ".compact.old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(path, old))
      throw new IllegalStateException(s"compaction: could not move $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new IllegalStateException(s"compaction: could not swap in $tmp")
    }
    fs.delete(old, true)

    val after = fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
    Stats(parquetFiles.length, after, bytes)
  }
}
