package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE guarded word-n-gram postings builder every n-gram operator
  * shares (shingles d2/d3, 8-grams d6, bigrams t5/t7/t14).
  *
  * The guard is the load-bearing part: Spark's `sequence(1, 0)` is the
  * DESCENDING array [1, 0] — not empty like `generate_series` — so an
  * unguarded generator emits spurious partial n-grams for docs shorter
  * than n (out-of-range w[i] turn null and concat_ws silently skips
  * them). Docs under n words must emit NOTHING, matching the DuckDB
  * oracles. Pinned by ShortDocsSpec; keep every n-gram site on this
  * helper so the guard can't silently diverge.
  */
object Ngrams {

  /** `(doc_id, <outCol>)` postings of word n-grams over `text`.
    * @param distinct dedupe WITHIN the doc before exploding
    *                 (array_distinct — set semantics without a shuffle)
    */
  def postings(df: DataFrame, n: Int, distinct: Boolean, outCol: String,
      spread: Boolean = true): DataFrame = {
    require(n >= 1)
    val s = df.sparkSession
    import s.implicits._
    val terms = (0 until n).map(j => s"w[i-1+$j]").mkString(", ")
    val core = s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', $terms))"
    val arr = if (distinct) s"array_distinct($core)" else core
    // spread before the explode: the split+transform+explode is the
    // CPU-heaviest map work in the text stack, and the single-row-group
    // testdata scans feed it exactly ONE task (guide §2.5; r13). Project
    // to (doc_id, text) FIRST so the exchange carries raw strings, not
    // the split word arrays (guide §2.3: project before the exchange).
    // `spread = false` for LIGHT explodes feeding an immediate aggregate
    // (bigram callers) — r13 measured the exchange costing more than the
    // single-task explode there (t5 0.30→0.84, t7 0.37→0.82 regressions,
    // reverted via this flag), while the heavy 3/8-gram sites keep the win.
    val base = df.select($"doc_id", $"text")
    (if (spread) graft.Tables.spread(base) else base)
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", explode(expr(
        s"CASE WHEN size(w) >= $n THEN $arr ELSE cast(array() AS array<string>) END")).as(outCol))
  }

  /** `(doc_id, sz, <outCol>)` distinct postings that CARRY the doc's
    * distinct-n-gram count as a column computed from the pre-explode
    * array. `sz` equals the per-doc row count of [[postings]] with
    * `distinct = true` (array_distinct before the explode — the guard
    * drops short docs from both views identically), so consumers that
    * used to re-aggregate the exploded postings back to per-doc sizes
    * and join them onto pair aggregates (d2/d13/d14) can instead fold
    * the carried column with max() inside the pair aggregate — the
    * mb1/e26 carried-stats idiom (guide §2.4: one less shuffle over the
    * full postings, two fewer joins).
    */
  def postingsWithSize(df: DataFrame, n: Int, outCol: String): DataFrame = {
    require(n >= 1)
    val s = df.sparkSession
    import s.implicits._
    val terms = (0 until n).map(j => s"w[i-1+$j]").mkString(", ")
    val core = s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', $terms))"
    graft.Tables.spread(df.select($"doc_id", $"text"))
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", expr(
        s"CASE WHEN size(w) >= $n THEN array_distinct($core) ELSE cast(array() AS array<string>) END").as("arr"))
      .select($"doc_id", size($"arr").cast("long").as("sz"), explode($"arr").as(outCol))
  }

  /** `(doc_id, pos, <outCol>)` postings with the n-gram's 1-based word
    * position — the occurrence-level view span operators need (d11 exact
    * substring dedup). `pos` matches DuckDB's `generate_series(1, …)`
    * index: the gram at `pos` covers words `pos … pos+n−1`. Same
    * short-doc guard as [[postings]]; no distinct variant (positions make
    * every occurrence unique).
    */
  def postingsWithPos(df: DataFrame, n: Int, outCol: String): DataFrame = {
    require(n >= 1)
    val s = df.sparkSession
    import s.implicits._
    val terms = (0 until n).map(j => s"w[i-1+$j]").mkString(", ")
    val core = s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', $terms))"
    // same single-row-group spread as postings() (guide §2.5; r13)
    graft.Tables.spread(df.select($"doc_id", $"text"))
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", posexplode(expr(
        s"CASE WHEN size(w) >= $n THEN $core ELSE cast(array() AS array<string>) END")))
      .select($"doc_id", (col("pos") + 1).cast("long").as("pos"), col("col").as(outCol))
  }
}
