package graft

import org.apache.spark.sql.SparkSession

/** One-call installation of every graft extension on an EXISTING session
  * — the runtime-attach twin of
  * `spark.sql.extensions=graft.functions.GraftExtensions` (which needs
  * to be set before the session exists):
  *
  *  - SQL functions: `vec_dot` (native codegen float dot product),
  *    `bloom_might_contain` (Spark's own predicate surfaced as a
  *    function), `bottom_k_sample` (deterministic mergeable per-group
  *    sampling), `freq_items` (Misra–Gries heavy-hitters sketch),
  *    `bitmap_distinct`/`bitmap_bytes`/`bitmap_or_count` (exact
  *    mergeable distinct over bounded domains + the persistable-partial
  *    pair), `count_min_sketch` (point-frequency sketch), `bloom_agg`
  *    (per-group bloom build — the BloomIndex primitive);
  *  - the bounded-levenshtein optimizer rule (entity-resolution verify
  *    predicates);
  *  - the native per-group top-k planner strategy
  *    ([[graft.plans.TopKPerGroup]]).
  *
  * Idempotent — safe to call from every entry point that might run
  * first (the driver mains do).
  */
object Graft {
  def install(spark: SparkSession): Unit = {
    functions.FloatVecDot.register(spark)
    functions.BloomFilters.register(spark)
    functions.BottomKSample.register(spark)
    functions.FrequentItems.register(spark)
    functions.BitmapDistinct.register(spark)
    functions.CountMinSketch.register(spark)
    operators.BloomIndex.register(spark)
    plans.TopKPerGroup.ensureStrategy(spark)
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(plans.BoundedLevenshteinRule))
      spark.experimental.extraOptimizations = rules :+ plans.BoundedLevenshteinRule
  }
}
