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
  * the stale plan.
  *
  * The fingerprint is the dir's top-level listing (name, mtime, length) —
  * one driver-side `listStatus` per call, O(tables) not O(files), because
  * any rewrite replaces or touches a top-level file/subdirectory. In-place
  * mutation of a nested part file without touching its parent would evade
  * it; Spark's committers never do that (writes always create/replace
  * files). Superseded entries stay persisted until [[clear]] — callers
  * cycling through MANY dir versions in one session should clear between
  * them.
  */
object Memo {
  private val cache = new ConcurrentHashMap[(SparkSession, String, String, String), DataFrame]()

  /** Cheap change-detector for a data directory: top-level child
    * (name, mtime, len) triples, hashed. Missing dir fingerprints as "".
    */
  def fingerprint(s: SparkSession, dir: String): String = {
    val path = new Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) ""
    else {
      val sig = fs.listStatus(path).map(st =>
        s"${st.getPath.getName}:${st.getModificationTime}:${st.getLen}")
        .sorted.mkString("|")
      java.util.UUID.nameUUIDFromBytes(
        sig.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    }
  }

  def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((s, dir, fingerprint(s, dir), key), _ => build.persist())

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
  }
}
