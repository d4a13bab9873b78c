package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for intermediate DataFrames shared across driver
  * queries (e.g. the MinHash+LSH pair list feeds both `d3_minhash_lsh` and
  * `d5_dup_clusters`). The first query materializes the persisted plan;
  * later queries in the same session reuse it instead of recomputing —
  * exactly what a warehouse would do with a hot derived table. Keyed by
  * (session, data dir, name) so tests with their own sessions or dirs
  * never cross-contaminate.
  */
object Memo {
  private val cache = new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def cached(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((s, dir, key), _ => build.persist())

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
