package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics completions over the event stream — the workloads a
  * commerce analytics engine serves daily: ordered conversion funnels and
  * cohort retention. Both are exact integer/µs arithmetic end-to-end
  * (oracle hash-exact), and both shuffle only on `user_id` / small group
  * keys — the per-user state never leaves its partition.
  */
object Funnels {

  /** W6: ordered conversion funnel view → click → purchase per user:
    * each stage's timestamp is the FIRST event of that type strictly
    * after the previous stage (not the global min — ordering is the
    * point of a funnel). Three conditional aggregates chained on the
    * user key; at 100 TB each pass is one partial-aggregating shuffle
    * on user_id, and the later passes ride the same partitioning.
    */
  val funnel = Q("w6_funnel",
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view_us
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click_us
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view_us
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase_us
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click_us
      |  GROUP BY e.user_id)
      |SELECT v.user_id, v.t_view_us, c.t_click_us, p.t_purchase_us
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"user_id", $"event_type", unix_micros($"ts").as("t_us"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"t_us").as("t_view_us"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id")
        .filter($"t_us" > $"t_view_us")
        .groupBy($"user_id").agg(min($"t_us").as("t_click_us"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id")
        .filter($"t_us" > $"t_click_us")
        .groupBy($"user_id").agg(min($"t_us").as("t_purchase_us"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select($"user_id", $"t_view_us", $"t_click_us", $"t_purchase_us")
  }

  private val weekUs = 7L * 86400 * 1000000

  /** W7: cohort retention — users grouped by their first-activity epoch
    * week, counted per week offset since the cohort week. The classic
    * retention triangle: one min-aggregate for cohorts, one distinct
    * count per (cohort, offset). All integer µs/week arithmetic.
    */
  val retention = Q("w7_retention",
    s"""WITH w AS (SELECT user_id, epoch_us(ts) // $weekUs AS week FROM events),
       |cohort AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id)
       |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
       |       count(DISTINCT w.user_id) AS n_users
       |FROM w JOIN cohort c ON w.user_id = c.user_id
       |GROUP BY 1, 2""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Tables.events(s, dir)
        .select($"user_id", expr(s"unix_micros(ts) div $weekUs").as("week"))
      val cohort = w.groupBy($"user_id").agg(min($"week").as("cohort_week"))
      w.join(cohort, "user_id")
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
  }

  /** W8: top event paths — each user's first 5 events in time order as a
    * path string, then the global top-10 paths by frequency. The Spark
    * idiom worth pinning: `collect_list` has NO deterministic order, so
    * ordered paths come from `sort_array(collect_list(struct(ts, id,
    * type)))` — the struct sorts by (ts, id) and the transform strips the
    * keys. One shuffle on user_id + a TakeOrdered top-k.
    */
  val topPaths = Q("w8_top_paths",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |paths AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM seq WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, count(*) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 10""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      // ts is µs TimestampType on both engines; event_id tie-breaks
      // same-timestamp events identically
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .groupBy($"user_id")
        .agg(concat_ws(">", expr(
          "transform(sort_array(collect_list(struct(rn, event_type))), x -> x.event_type)"))
          .as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_users"))
        .orderBy($"n_users".desc, $"path")
        .limit(10)
  }

  /** A10: fixed-width histogram of order totals — bucket =
    * floor((x − lo) / width) with exact double operands, clamped to
    * [0, 19]. One hash aggregate; the shape behind every numeric
    * distribution dashboard.
    */
  val histogram = Q("a10_histogram",
    """SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 25000.0), 0), 19) AS BIGINT) AS bucket,
      |       count(*) AS n,
      |       CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
      |       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
      |FROM orders GROUP BY 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy(least(greatest(floor(($"o_totalprice" - 0.0) / 25000.0), lit(0)), lit(19))
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(Exact.dec2($"o_totalprice")).cast("double").as("lo"),
          max(Exact.dec2($"o_totalprice")).cast("double").as("hi"))
  }

  private val burstGapUs = 86400L * 1000000 // 24 h

  /** W14: GAPS-AND-ISLANDS run detection — maximal per-user bursts of
    * consecutive `error` events with inter-event gap ≤ 24 h, keeping
    * bursts of ≥ 3 (the MATCH_RECOGNIZE `ERROR{3,}` pattern without the
    * operator: break-flag via `lag`, island id via running sum of breaks,
    * one aggregate per island). Both windows share the (user_id; ts,
    * event_id) sort, so the whole query is ONE shuffle + one sort, and
    * the tie-break pins same-µs events identically on both engines.
    */
  val errorBursts = Q("w14_error_bursts",
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t
       |           FROM events WHERE event_type = 'error'),
       |d AS (SELECT *, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
       |                       OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > $burstGapUs
       |                     THEN 1 ELSE 0 END AS brk
       |      FROM e),
       |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
       |                               ROWS UNBOUNDED PRECEDING) AS grp
       |      FROM d)
       |SELECT user_id, CAST(grp AS BIGINT) AS burst_id,
       |       min(t) AS start_us, max(t) AS end_us,
       |       count(*) AS n_errors
       |FROM g GROUP BY user_id, grp HAVING count(*) >= 3""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"t", $"event_id")
      val wRun = w.rowsBetween(Long.MinValue, 0)
      Tables.events(s, dir)
        .filter($"event_type" === "error")
        .select($"user_id", $"event_id", unix_micros($"ts").as("t"))
        .withColumn("brk",
          when(lag($"t", 1).over(w).isNull
            || $"t" - lag($"t", 1).over(w) > burstGapUs, 1).otherwise(0))
        .withColumn("burst_id", sum($"brk").over(wRun).cast("long"))
        .groupBy($"user_id", $"burst_id")
        .agg(min($"t").as("start_us"), max($"t").as("end_us"),
          count(lit(1)).as("n_errors"))
        .filter($"n_errors" >= 3)
  }

  /** W18: LAST-TOUCH marketing attribution — each purchase's revenue is
    * credited to the most recent view/click touch by the same user
    * strictly before it and within a 7-day lookback; purchases with no
    * in-window touch credit `direct`. The touch channel derives
    * deterministically from the event payload (`k % 5` — the f4
    * deterministic-assignment idiom, since the synthetic feed carries no
    * channel column).
    *
    * Shape and scale: candidates come from ONE user_id equi-join with the
    * lookback band as a residual predicate (never a time-only range
    * join), the winner is a per-purchase rank-1 window with the
    * (t_us, event_id) tie-break pinned on both engines, and the rollup is
    * a |channels|-row aggregate. Per-user touch volume bounds the join
    * fanout; everything shuffles on user_id / purchase id only. Revenue
    * stays integer cents end-to-end (Exact.dec2 discipline).
    */
  /** The touch/purchase/candidate CTEs w18 and w24 share — SQL mirror of
    * [[touchFrame]]/[[purchaseFrame]] plus the 7-day strict-before
    * lookback left join.
    */
  private val touchCandCtes =
    """t AS (
      |  SELECT user_id, epoch_us(ts) AS t_us, event_id AS tid,
      |         CASE CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
      |           WHEN 0 THEN 'email' WHEN 1 THEN 'search' WHEN 2 THEN 'social'
      |           WHEN 3 THEN 'ads' ELSE 'organic' END AS channel
      |  FROM events WHERE event_type IN ('view', 'click')),
      |p AS (
      |  SELECT event_id AS pid, user_id, epoch_us(ts) AS p_us,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT p.pid, p.cents, t.channel, t.t_us, t.tid
      |  FROM p LEFT JOIN t ON p.user_id = t.user_id
      |    AND t.t_us < p.p_us AND t.t_us >= p.p_us - 604800000000)""".stripMargin

  val attribution = Q("w18_attribution",
    s"""WITH $touchCandCtes,
      |ranked AS (
      |  SELECT pid, cents, coalesce(channel, 'direct') AS channel,
      |         row_number() OVER (PARTITION BY pid
      |           ORDER BY t_us DESC NULLS LAST, tid DESC NULLS LAST) AS rn
      |  FROM cand)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
      |       CAST(sum(cents) AS BIGINT) AS attributed_cents
      |FROM ranked WHERE rn = 1 GROUP BY channel""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      lastTouch(touchFrame(ev), purchaseFrame(ev))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("attributed_cents"))
  }

  /** The `(user_id, t_us, tid, channel)` touch frame w18/w24 share — the
    * channel derives deterministically from the payload (f4 idiom).
    */
  private def touchFrame(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id").as("tid"),
        (get_json_object(col("props"), "$.k").cast("long") % 5).as("k5"))
      .select(col("user_id"), col("t_us"), col("tid"),
        when(col("k5") === 0, "email").when(col("k5") === 1, "search")
          .when(col("k5") === 2, "social").when(col("k5") === 3, "ads")
          .otherwise("organic").as("channel"))

  /** The `(pid, user_id, p_us, cents)` purchase frame w18/w24 share —
    * revenue as exact integer cents (Exact.dec2 discipline).
    */
  private def purchaseFrame(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("p_us"),
        (Exact.dec2(col("value")) * 100).cast("long").as("cents"))

  /** W24: POSITION-BASED (U-shaped) multi-touch attribution — w18's
    * multi-touch sibling: each purchase's cents split 40% to the FIRST
    * in-window touch, 40% to the LAST, 20% evenly across the middles
    * (single-touch and no-touch purchases keep last-touch semantics:
    * full credit to the touch / to `direct`).
    *
    * Exactness: the split is ALL-INTEGER with per-purchase conservation
    * by construction — first = (cents·40) div 100, each middle =
    * ((cents·20) div 100) div (n−2), and the LAST absorbs every
    * remainder (last = cents − first − Σ middles), so
    * Σ channel credits ≡ Σ purchase cents exactly (AttributionSpec pins
    * it). cents ≥ 0 keeps Spark's truncating `div` ≡ DuckDB's flooring
    * `//`.
    *
    * Shape: the same one user_id equi-join + per-pid windows as w18 (the
    * rank and the touch count share one partition), then a |channels|-row
    * rollup — nothing new shuffles at 100 TB.
    */
  val positionAttribution = Q("w24_position_attribution",
    s"""WITH $touchCandCtes,
      |ranked AS (
      |  SELECT pid, cents, coalesce(channel, 'direct') AS channel,
      |         row_number() OVER (PARTITION BY pid ORDER BY t_us, tid) AS rn,
      |         count(t_us) OVER (PARTITION BY pid) AS n
      |  FROM cand),
      |credit AS (
      |  SELECT pid, channel,
      |         CASE WHEN n <= 1 THEN cents
      |              WHEN rn = 1 THEN (cents * 40) // 100
      |              WHEN rn = n THEN cents - (cents * 40) // 100
      |                - CASE WHEN n > 2
      |                       THEN (n - 2) * (((cents * 20) // 100) // (n - 2))
      |                       ELSE 0 END
      |              ELSE ((cents * 20) // 100) // (n - 2) END AS credit_cents
      |  FROM ranked)
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
      |       CAST(sum(credit_cents) AS BIGINT) AS credited_cents
      |FROM credit GROUP BY channel""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      positionCredits(touchFrame(ev), purchaseFrame(ev))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_credits"),
          sum($"credit_cents").cast("long").as("credited_cents"))
  }

  /** The U-shaped credit core over the shared frames — one row per
    * (purchase, touch) with its integer credit (plus the `direct` row for
    * untouched purchases). Factored out so AttributionSpec can pin exact
    * per-purchase conservation on synthetic frames.
    */
  private[graft] def positionCredits(
      touches: org.apache.spark.sql.DataFrame,
      purchases: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cand = purchases.join(touches,
      purchases("user_id") === touches("user_id")
        && col("t_us") < col("p_us")
        && col("t_us") >= col("p_us") - 604800000000L, "left")
    val byPid = org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
    val ordered = byPid.orderBy(col("t_us"), col("tid"))
    cand.select(col("pid"), col("cents"),
        coalesce(col("channel"), lit("direct")).as("channel"),
        row_number().over(ordered).as("rn"),
        count(col("t_us")).over(byPid).as("n"))
      .select(col("pid"), col("channel"), expr(
        """CAST(CASE WHEN n <= 1 THEN cents
          |     WHEN rn = 1 THEN (cents * 40) div 100
          |     WHEN rn = n THEN cents - (cents * 40) div 100
          |       - CASE WHEN n > 2
          |              THEN (n - 2) * (((cents * 20) div 100) div (n - 2))
          |              ELSE 0 END
          |     ELSE ((cents * 20) div 100) div (n - 2) END AS BIGINT)""".stripMargin)
        .as("credit_cents"))
  }

  /** The attribution core over any `(user_id, t_us, tid, channel)` touch
    * frame and `(pid, user_id, p_us, cents)` purchase frame — one row per
    * purchase with its winning channel (`direct` when no touch lies in
    * the strict-before 7-day window). Factored out so AttributionSpec can
    * pin the boundary semantics on synthetic frames.
    */
  private[graft] def lastTouch(
      touches: org.apache.spark.sql.DataFrame,
      purchases: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cand = purchases.join(touches,
      purchases("user_id") === touches("user_id")
        && col("t_us") < col("p_us")
        && col("t_us") >= col("p_us") - 604800000000L, "left")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("pid"))
      .orderBy(col("t_us").desc_nulls_last, col("tid").desc_nulls_last)
    cand.select(col("pid"), col("cents"),
        coalesce(col("channel"), lit("direct")).as("channel"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select(col("pid"), col("cents"), col("channel"))
  }

  /** W20: LTV COHORT TRIANGLE — w7's revenue sibling: customers grouped
    * by ACQUISITION month (first order), each cohort's revenue tracked by
    * month offset with the cumulative LTV curve and per-customer LTV.
    *
    * Shape: one custkey aggregate for the cohort assignment, one
    * (cohort, offset) rollup, then windows PARTITIONED BY COHORT — the
    * partitions are |offsets| ≤ the calendar span, so the cumulative
    * curve never creates a single-partition window. Per-customer LTV is
    * an integral division (`div`/`//` — floor on positives in both
    * engines), not a double ratio.
    */
  val ltvCohort = Q("w20_ltv_cohort",
    """WITH o AS (
      |  SELECT o_custkey AS c,
      |         year(o_orderdate) * 12 + month(o_orderdate) AS m,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM orders),
      |coh AS (SELECT c, min(m) AS m0 FROM o GROUP BY 1),
      |cell AS (
      |  SELECT coh.m0 AS cohort_month, o.m - coh.m0 AS month_offset,
      |         count(DISTINCT o.c) AS n_active, CAST(sum(o.y) AS BIGINT) AS rev_cents
      |  FROM o JOIN coh ON o.c = coh.c
      |  GROUP BY 1, 2),
      |tri AS (
      |  SELECT *,
      |         CAST(sum(rev_cents) OVER (PARTITION BY cohort_month ORDER BY month_offset
      |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
      |         first_value(n_active) OVER (PARTITION BY cohort_month
      |                                     ORDER BY month_offset) AS cohort_size
      |  FROM cell)
      |SELECT cohort_month, month_offset, n_active, rev_cents, cum_cents,
      |       CAST(cohort_size AS BIGINT) AS cohort_size,
      |       CAST(cum_cents // cohort_size AS BIGINT) AS ltv_cents_per_customer
      |FROM tri""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir).select($"o_custkey".as("c"),
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"),
        (Exact.dec2($"o_totalprice") * 100).cast("long").as("y"))
      val coh = o.groupBy($"c").agg(min($"m").as("m0"))
      val cell = o.join(coh, "c")
        .groupBy($"m0".as("cohort_month"), ($"m" - $"m0").as("month_offset"))
        .agg(countDistinct($"c").as("n_active"),
          sum($"y").cast("long").as("rev_cents"))
      val byCohort = org.apache.spark.sql.expressions.Window
        .partitionBy($"cohort_month").orderBy($"month_offset")
      cell
        .withColumn("cum_cents", sum($"rev_cents")
          .over(byCohort.rowsBetween(Long.MinValue, 0)).cast("long"))
        .withColumn("cohort_size", first($"n_active").over(byCohort).cast("long"))
        .withColumn("ltv_cents_per_customer",
          expr("CAST(cum_cents div cohort_size AS BIGINT)"))
  }

  /** W21: TIME-TO-CONVERT distribution — the latency between a user's
    * funnel stages (first view → first purchase strictly after it, the
    * w6 stage rule), summarized as exact `percentile_disc` quartiles of
    * the µs gap. One user_id-keyed pass reusing the funnel chain, then a
    * single-row quantile aggregate — the "how long does conversion take"
    * readout every funnel dashboard pairs with w6's counts.
    */
  val timeToConvert = Q("w21_time_to_convert",
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view_us
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |p AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase_us
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.t_view_us
      |  GROUP BY e.user_id),
      |lat AS (
      |  SELECT p.t_purchase_us - v.t_view_us AS gap_us
      |  FROM v JOIN p ON v.user_id = p.user_id)
      |SELECT count(*) AS n_conversions,
      |       min(gap_us) AS min_us,
      |       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY gap_us) AS BIGINT) AS p25_us,
      |       CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY gap_us) AS BIGINT) AS p50_us,
      |       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY gap_us) AS BIGINT) AS p75_us,
      |       max(gap_us) AS max_us
      |FROM lat""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min(unix_micros($"ts")).as("t_view_us"))
      val p = ev.filter($"event_type" === "purchase")
        .join(v, "user_id")
        .filter(unix_micros($"ts") > $"t_view_us")
        .groupBy($"user_id").agg(min(unix_micros($"ts")).as("t_purchase_us"))
      v.join(p, "user_id")
        .select(($"t_purchase_us" - $"t_view_us").as("gap_us"))
        .agg(count(lit(1)).as("n_conversions"),
          min($"gap_us").as("min_us"),
          expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)")
            .as("p25_us"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)")
            .as("p50_us"),
          expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)")
            .as("p75_us"),
          max($"gap_us").as("max_us"))
  }

  /** A27: A/B EXPERIMENT evaluation — the two-proportion z-test over
    * conversion (first view → any later purchase, w6's strict-after
    * rule), with the variant assigned deterministically from the user id
    * (`user_id % 2` — the f4 idiom; a real assignment column drops in
    * unchanged). Emits both arms' exposure/conversion counts, the rates,
    * and the pooled z statistic.
    *
    * Exactness: counts are exact ints; rates and z are a FIXED chain of
    * IEEE ops (divide, multiply, sqrt — all correctly rounded) over
    * exact operands, mirrored operation-for-operation in the oracle, so
    * the statistic is bit-identical across engines. One user-keyed pass
    * + a 1-row conditional aggregate.
    */
  val abTest = Q("a27_ab_test",
    """WITH v AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t_view_us
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |conv AS (
      |  SELECT v.user_id, CAST(v.user_id % 2 AS BIGINT) AS variant,
      |         CASE WHEN max(CASE WHEN e.event_type = 'purchase'
      |                             AND epoch_us(e.ts) > v.t_view_us
      |                             AND epoch_us(e.ts) <= v.t_view_us + 86400000000
      |                            THEN 1 ELSE 0 END) = 1
      |              THEN 1 ELSE 0 END AS converted
      |  FROM v LEFT JOIN events e ON v.user_id = e.user_id
      |  GROUP BY v.user_id, v.t_view_us),
      |arms AS (
      |  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
      |         CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_control,
      |         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
      |         CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_treatment
      |  FROM conv)
      |SELECT n_control, conv_control, n_treatment, conv_treatment,
      |       CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS rate_control,
      |       CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS rate_treatment,
      |       CASE WHEN conv_control + conv_treatment = 0
      |              OR conv_control + conv_treatment = n_control + n_treatment
      |            THEN NULL
      |            ELSE (CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
      |                  - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))
      |                 / sqrt((CAST(conv_control + conv_treatment AS DOUBLE)
      |                         / CAST(n_control + n_treatment AS DOUBLE))
      |                        * (1 - CAST(conv_control + conv_treatment AS DOUBLE)
      |                               / CAST(n_control + n_treatment AS DOUBLE))
      |                        * (1 / CAST(n_control AS DOUBLE) + 1 / CAST(n_treatment AS DOUBLE)))
      |       END AS z_score
      |FROM arms""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min(unix_micros($"ts")).as("t_view_us"))
      val conv = v.join(ev, Seq("user_id"), "left")
        .groupBy($"user_id", $"t_view_us")
        .agg(when(max(when($"event_type" === "purchase"
            && unix_micros($"ts") > $"t_view_us"
            && unix_micros($"ts") <= $"t_view_us" + 86400000000L, 1).otherwise(0)) === 1, 1)
          .otherwise(0).as("converted"))
        .select(($"user_id" % 2).cast("long").as("variant"), $"converted")
      val arms = conv.agg(
        sum(when($"variant" === 0, 1).otherwise(0)).cast("long").as("n_control"),
        sum(when($"variant" === 0, $"converted").otherwise(0)).cast("long").as("conv_control"),
        sum(when($"variant" === 1, 1).otherwise(0)).cast("long").as("n_treatment"),
        sum(when($"variant" === 1, $"converted").otherwise(0)).cast("long").as("conv_treatment"))
      val rc = $"conv_control".cast("double") / $"n_control".cast("double")
      val rt = $"conv_treatment".cast("double") / $"n_treatment".cast("double")
      val pooled = ($"conv_control" + $"conv_treatment").cast("double") /
        ($"n_control" + $"n_treatment").cast("double")
      arms.select($"n_control", $"conv_control", $"n_treatment", $"conv_treatment",
        rc.as("rate_control"), rt.as("rate_treatment"),
        when($"conv_control" + $"conv_treatment" === 0
            || $"conv_control" + $"conv_treatment" === $"n_control" + $"n_treatment",
          lit(null).cast("double"))
          .otherwise((rt - rc) / sqrt(pooled * (lit(1) - pooled)
            * (lit(1) / $"n_control".cast("double") + lit(1) / $"n_treatment".cast("double"))))
          .as("z_score"))
  }

  val queries: Seq[Q] =
    Seq(funnel, retention, topPaths, histogram, errorBursts, attribution,
      positionAttribution, ltvCohort, timeToConvert, abTest)
}
