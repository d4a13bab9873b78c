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

  val queries: Seq[Q] = Seq(funnel, retention, topPaths, histogram, errorBursts)
}
