package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Physical-plan regression tests: the properties that matter at 100 TB
  * (filter/column pushdown into the parquet scan, broadcast dimension
  * joins, whole-stage codegen, heap-based global top-k) are asserted on
  * the optimized plans, so a refactor that silently loses one fails CI.
  */
class PlanSpec extends AnyFunSuite with SparkTestKit {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** simple-mode plan: one line per operator (codegen stages marked `*(n)`) —
    * used for counting operators without the formatted details section
    * duplicating names.
    */
  private def simplePlanOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("s2: predicate AND projection pushed into the parquet scan") {
    val p = planOf(ScansProjections.s2Pushdown.run(spark, sfDir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    // ReadSchema pruned to the 3 referenced columns, not all 11
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("w16: the hopping-window generator prunes the events scan to 3 of 6 columns") {
    val p = planOf(Windows.hoppingWindow.run(spark, sfDir))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema:")).mkString
    assert(readSchema.contains("ts") && readSchema.contains("event_type")
      && readSchema.contains("value"), readSchema)
    assert(!readSchema.contains("props") && !readSchema.contains("user_id"), readSchema)
    // window() must plan as a generator/projection + ONE hash aggregate —
    // no join, no extra shuffle beyond the aggregate's
    val sp = simplePlanOf(Windows.hoppingWindow.run(spark, sfDir))
    assert(!sp.contains("Join"), sp)
    assert(sp.linesIterator.count(_.contains("Exchange")) <= 1, sp)
  }

  test("star join: every dimension joins as broadcast, fact scanned once") {
    val p = simplePlanOf(Joins.starJoin.run(spark, sfDir))
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, plan:\n$p")
    // the fact table feeds the join tree exactly once
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1, p)
  }

  test("cm2 mart: lineitem rollup aggregates BEFORE the orders join") {
    val p = planOf(CommerceKpi.cm2(spark, sfDir))
    // partial aggregation on the fact side must appear below the join in
    // the operator list: the HashAggregate on l_orderkey precedes any join
    // of the geo side
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("narrow projections stay inside whole-stage codegen") {
    for (q <- Seq(ScansProjections.p3Cleanse, Scalars.f1Classifier,
        TextAnalysis.tokenCount)) {
      val p = simplePlanOf(q.run(spark, sfDir))
      // `*(n)` prefixes mark whole-stage-codegen'd operators
      assert(p.contains("*("), s"${q.name} lost codegen:\n$p")
      assert(!p.contains("Exchange"), s"${q.name} has an unexpected shuffle:\n$p")
    }
  }

  test("global top-k plans TakeOrderedAndProject (no full sort)") {
    val p = planOf(Windows.topkGlobal.run(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("incremental filter pushes the watermark predicate to the scan") {
    val p = planOf(ScansProjections.p2Incremental.run(spark, sfDir))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(ts"), p)
  }

  test("w4 sessionize: one shuffle, both windows ride one sort") {
    // r7 pinned BOTH windows (lag-flag and running-sum) to the same
    // (user_id / ts, event_id) ordering — beyond determinism, that lets
    // Spark satisfy the second window with the FIRST window's sort: the
    // plan must shuffle once on user_id and sort once
    val p = simplePlanOf(AdvancedOps.sessionize.run(spark, sfDir))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    val sorts = p.linesIterator.count(_.contains("Sort "))
    // ONE shuffle for the whole query: the final (user_id, session_id)
    // aggregate's clustered distribution is satisfied by the windows'
    // hashpartitioning(user_id), so even the groupBy rides along
    assert(exchanges == 1, s"expected a single user_id shuffle, got $exchanges:\n$p")
    assert(sorts == 1, s"both windows must share one sort, got $sorts:\n$p")
    assert(p.linesIterator.count(_.contains("Window")) == 2, p)
  }

  test("q7 pyramid: dimensions broadcast, both facts scanned once") {
    val p = simplePlanOf(Warehouse.q7Volume.run(spark, sfDir))
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
    assert(p.linesIterator.count(_.contains("lineitem.parquet")) == 1, p)
    assert(p.linesIterator.count(_.contains("orders.parquet")) == 1, p)
  }

  test("correlated scalar subqueries decorrelate into joins") {
    val p = simplePlanOf(Subqueries.corrSubquery.run(spark, sfDir))
    // after decorrelation the per-row subqueries become aggregate+join —
    // no scalar-subquery node survives into the physical plan
    assert(!p.contains("Subquery"), p)
    assert(p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("exact dedup is a single-shuffle hash aggregate") {
    val p = simplePlanOf(Dedup.exact.run(spark, sfDir))
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("d4 simhash: banded equi-join candidates, no cartesian pair step") {
    val p = simplePlanOf(Dedup.simhash.run(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"all-pairs join crept back in:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs join crept back in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join:\n$p")
  }

  test("j6 range join: time-bucket equi-join, no nested-loop cartesian") {
    val p = simplePlanOf(AdvancedOps.rangeJoin.run(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a cartesian:\n$p")
  }

  test("multi-probe ANN variants stay bucket equi-joins (no cartesian)") {
    for (q <- Seq(Similarity.annMultiProbe, Similarity.annRandomHyperplane)) {
      val p = simplePlanOf(q.run(spark, sfDir))
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"${q.name} degenerated to a cartesian:\n$p")
    }
  }

  test("w8 top paths: global top-k plans TakeOrderedAndProject") {
    val p = planOf(Funnels.topPaths.run(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("t18 importance weighting: both bucket count tables join as broadcast") {
    val p = simplePlanOf(TrainingPrep.importanceWeight.run(spark, sfDir))
    // the target and raw 256-row count tables must reach the candidate
    // postings as broadcasts — a shuffle join here would shuffle the
    // full corpus postings twice for two tiny sides
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p)
  }

  test("o2: the keyset anchor predicate pushes down to the orders scan") {
    val p = planOf(graft.queries.Windows.keysetPagination.run(spark, sfDir))
    assert(p.contains("PushedFilters:") && p.contains("Or(LessThan(o_totalprice"),
      p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("GLOBAL sweep: no registry query plans a cartesian/nested-loop join (whitelist excepted)") {
    // the only justified nested-loop joins: deliberate few-row broadcast
    // sides whose cardinality is a CONSTANT of the algorithm, not of the
    // data — brute-force probes (e1), t10's 1-row document-frequency
    // aggregate, PQ's probe table (e7), and IVF's k-centroid table
    // (e4, and e8 which reuses the same cached index — the BNLJ sits in
    // the index BUILD subtree under the InMemoryRelation; e8's own pair
    // step is equi-join-only, asserted in SemDedupSpec)
    val whitelist = Set("e1_cosine_topk", "t10_tfidf_search", "e7_pq_ann",
      "e4_ivf_ann", "e8_semdedup",
      // e9/e10 compose the e4 + e7-shaped indexes — the same k-centroid /
      // probe broadcast BNLJs sit in their (cached) index-build subtrees
      "e9_ivfpq_ann", "e10_ivfpq_residual",
      // e11 blocks on the same cached IVF index (r6 fine-cell swap) and
      // e12 consumes e11's memoized graph — the only BNLJ either plan
      // carries is the identical k-centroid broadcast in the index-build
      // subtree; their own pair/cluster steps are equi-joins (KnnGraphSpec)
      "e11_knn_graph", "e12_graph_downsample",
      // e13's only BNLJs are the 1-ROW global-N broadcast (vtx ⨯ nn, the
      // t10 global-stats pattern, once per unrolled iteration) plus the
      // same cached index-build subtree as e11; every edge/inflow step
      // is a keyed equi-join. e14 consumes the same memoized graph (its
      // only BNLJ is that cached subtree); its vote/majority rounds are
      // keyed equi-joins.
      // e13b adds one more 1-row broadcast (the dangling-mass aggregate);
      // e15's only BNLJ is the 1-row probe broadcast before the shortlist
      "e13_graph_pagerank", "e13b_pagerank_redistribute", "e14_label_propagation",
      // e15/e16: 1-row probe broadcast / 8-row probe broadcast (e1 shape);
      // a20: 1-row × 1-row global-stat join; e17: k-centroid broadcast
      // inside probeCells (the e4 shape over the persisted layout)
      "e15_mmr_diversify", "e16_sq8_ann", "a20_sketch_union",
      // d22: the final 1-row(metrics) × 1-row(n_docs) join — both sides
      // global aggregates, constant size by construction; every pair
      // step above it (band candidates, truth verify) is equi-join-only
      "d22_blocking_quality",
      // j14: the final 1-row(m) × 1-row(sa) × 1-row(sb) metric join —
      // the degree-profile join itself is a keyed equi-join
      "j14_join_price",
      // e17/e18: the shared index-build subtree again (k-centroid bcast)
      "e17_ivf_persisted", "e18_triangle_count",
      // e19: the exact-baseline side is e1's probe-broadcast shape (32
      // constant probe rows × corpus); the approx side is equi-joined
      "e19_ann_recall",
      // s7/q11/q22: the 1-ROW global-scalar cross join (corpus total /
      // Σ part_value / positive-average) — the t10 global-stats pattern
      "s7_dynamic_partition_pruning", "q11_important_parts",
      "q22_inactive_balance",
      // e20: the shared cached index-build subtree (k-centroid bcast)
      // plus TWO 1-row global-stat broadcasts (the mid split point and
      // the version totals) — all algorithm-constant cardinalities
      "e20_centroid_drift",
      // e21 composes e18's edge list — the only BNLJ is the same cached
      // k-centroid index-build subtree; degree/triangle joins are keyed
      "e21_clustering_coefficient",
      // ml2: the 1-ROW solved-weights broadcast joined to every doc for
      // the exact-SSE pass (the t10 global-stats pattern)
      "ml2_ridge",
      // e22 consumes the same memoized kNN graph as e18/e21 — the only
      // BNLJ is the cached k-centroid index-build subtree; every BFS
      // relaxation round is a keyed equi-join + min-aggregate
      "e22_bfs_hops",
      // e24 consumes the same memoized kNN graph — the only BNLJ is the
      // cached index-build subtree; every peel round is two semi-join
      // restrictions + one count aggregate
      "e24_kcore",
      // mb1: the 1-ROW n_baskets broadcast onto the pair rules (the t10
      // global-stats pattern); pair generation itself is the basket-key
      // equi-join, asserted in BasketSpec's fanout bound
      "mb1_market_basket",
      // a22: the 1-ROW Σfreq total broadcast onto the |buckets|-row
      // histogram (the t10 global-stats pattern); the per-key count and
      // bucket rollup are plain hash aggregates
      "a22_join_skew_profile",
      // a23: TWO 1-row broadcasts (global max day, the 12-threshold
      // percentile row) onto the customer rollup — both algorithm-
      // constant cardinalities; the rollup itself is one hash aggregate
      "a23_rfm_segments",
      // a24: the 1-row revenue-total broadcast onto the classified part
      // list (t10 pattern); the scan itself is PrefixScan's bucketed
      // windows — no global sort, no cartesian
      "a24_abc_pareto",
      // t31: the 1-row corpus-count broadcast onto the scored postings
      // (t10 pattern); tf/df joins are phrase equi-joins and the top-k
      // is the native TopKPerGroup plan (pinned in TopKPerGroupSpec)
      "t31_keyword_extract",
      // dq5: the 1-row period-totals broadcast onto the |bins|-row
      // histogram (t10 pattern); both period counts come from one
      // conditional aggregate over one scan
      "dq5_distribution_drift",
      // t33: TWO 1-row broadcasts (the solved Q20 weights, the P90
      // threshold) onto the doc scoring pass — the ml2 pattern applied
      // per doc
      "t33_model_quality_filter",
      // t34: the 1-row corpus-stats broadcast (N, avgdl, per-term df)
      // onto the tf scoring scan — t10's pattern with BM25 arithmetic
      "t34_bm25",
      // mb2: inherits mb1's 1-row n_baskets broadcast through the shared
      // pairRules mill; pair generation stays the basket-key equi-join
      // and the top-k is the native TopKPerGroup plan
      "mb2_item_recommendation",
      // ml4/e26/e27 consume the memoized e11 kNN graph — the only BNLJ is
      // the cached k-centroid index-build subtree (e14's justification);
      // votes/wedges/score rounds are keyed equi-joins. e27 adds one
      // 1-row max-score broadcast per half-round (t10 pattern).
      "ml4_knn_classifier", "e26_link_prediction", "e27_hits",
      // t35: TWO 1-row totals broadcasts (unigram + bigram corpus
      // totals, t10 pattern); the unigram joins are keyed equi-joins
      "t35_collocation_lift",
      // dq8: TWO 1-row broadcasts (global row total, Σq_ppm — t10
      // pattern); the band-share join is a keyed equi-join
      "dq8_t_closeness",
      // e28: e13's justification verbatim — the cached index-build
      // subtree plus the 1-row seed-count broadcast per iteration;
      // every edge/inflow step is a keyed equi-join
      "e28_personalized_pagerank",
      // e29: the same memoized-graph subtree + the 1-row edge-count
      // broadcast (t10 pattern); community/degree joins are keyed
      "e29_modularity",
      // dq10: the 1-row global-max broadcast (t10 pattern)
      "dq10_freshness",
      // e30/e31: pure subset/self-join/degree-stats over the memoized
      // e11 graph — the only BNLJ is the cached index-build subtree
      // (e14's justification)
      "e30_mutual_knn", "e31_assortativity",
      // t36/dq11: the 1-row corpus-total broadcast (t10 pattern); the
      // token/digit joins are keyed
      "t36_token_burstiness", "dq11_benford",
      // t37: the 4-ROW cutoff table theta-joined onto the first-seen
      // aggregate (first_seen <= cutoff) — algorithm-constant broadcast
      // side; the token explode + min-aggregate is one hash aggregate
      "t37_heaps_law",
      // d19: THREE 1-row parameter broadcasts (m estimates, u chance
      // rates, n_cust — the t10 pattern); candidate generation is the
      // d7 blocked equi-join
      "d19_fellegi_sunter",
      // m3: the 1-row n_batches broadcast onto each ranked modality
      // (t10 pattern); the modalities never join each other
      "m3_modality_interleave",
      // e32: the 8-probe × nCells cell-cap join (the e1/e16 constant-
      // probe-broadcast shape — cells are k-bounded, members equi-join
      // on cell_id) plus the shared cached k-centroid index-build
      // subtree (e4's justification)
      "e32_radius_search",
      // e33: the 1-row total broadcast onto the ≤k-row cell histogram
      // (t10 pattern) + the shared cached index-build subtree
      "e33_ivf_cell_balance",
      // a32: the 1-row (tr, nr) reference broadcast onto the |days|-row
      // daily rollup, and the 1-row recurrence seed — both constant-size
      // scalar joins (the dq3/a31 precedent)
      "a32_cusum_changepoint",
      // a31: the 1-row (n1, n2) totals broadcast onto the distinct-value
      // CDF grid (t10 pattern); the cumulatives are PrefixScan's bucketed
      // windows, the rest is hash aggregates
      "a31_ks_test")
    val offenders = SparkEntry.registry
      .filterNot(q => whitelist.contains(q.name))
      .flatMap { q =>
        val p = simplePlanOf(q.run(spark, sfDir))
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty,
      s"queries planning cartesian/nested-loop joins: ${offenders.mkString(", ")} — " +
        "either fix the plan or justify a whitelist entry")
  }

  test("runtime bloom-filter join reduction fires on the selective-dim fact join shape") {
    // Catalyst's InjectRuntimeFilter (the 100 TB semi-join reduction: a
    // bloom built from the filtered dim side prunes the fact scan before
    // the shuffle) is threshold-gated for small inputs — lower the
    // thresholds on a forked session and pin that the engine's canonical
    // join shape actually triggers it, and that results are unchanged.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    import org.apache.spark.sql.functions._
    def join(sess: org.apache.spark.sql.SparkSession) = {
      val li = Tables.lineitem(sess, sfDir).select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(sess, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    }
    val p = simplePlanOf(join(s2))
    assert(p.toLowerCase.contains("bloom"),
      s"runtime bloom filter did not inject:\n$p")
    val base = join(spark).collect().head
    val got = join(s2).collect().head
    assert(got.getLong(0) == base.getLong(0) && got.getDouble(1) == base.getDouble(1))
  }

  test("e1 cosine top-k: broadcasts the probe side, never the corpus") {
    val p = simplePlanOf(Similarity.cosineTopK.run(spark, sfDir))
    // the only broadcast subtree must be the vec_id<8 probe set; the
    // corpus (unfiltered scan) must be the streamed side — broadcasting
    // the corpus is a driver OOM at scale
    val idx = p.indexOf("BroadcastExchange")
    assert(idx >= 0, p)
    assert(p.substring(idx).contains("< 8"),
      s"broadcast subtree is not the probe filter:\n$p")
    assert(!p.substring(0, idx).contains("< 8"),
      s"probe filter found on the streamed side:\n$p")
  }
}
