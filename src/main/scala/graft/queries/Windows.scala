package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** SURVEY §2.5 — the reference itself uses no window functions; a complete
  * engine needs ranking, running totals, lag/lead, and global top-k, so
  * they are first-class here.
  *
  * Scale notes: every window partitions by a high-cardinality key
  * (user_id / custkey) — one hash shuffle on the partition key, then
  * in-partition sort; no global sort anywhere except the top-k, which
  * Spark plans as TakeOrderedAndProject (per-partition heap + driver
  * merge, never a full sort at 100 TB).
  */
object Windows {

  /** row_number top-N per group (ordering made total with the unique
    * event_id tiebreak).
    */
  val topkPerGroup = Q("w1_topk_per_group",
    """SELECT user_id, event_id, event_type, rn FROM (
      |  SELECT user_id, event_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id")
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"user_id", $"event_id", $"event_type", $"rn")
  }

  /** Running total per customer over order history (rows frame). */
  val runningSum = Q("w2_running_sum",
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          sum(dec2($"o_totalprice")).over(w).cast("double").as("running_spend"))
  }

  /** lag: days since the customer's previous order. */
  val lagDays = Q("w3_lag_days_between",
    """SELECT o_custkey, o_orderkey,
      |       CAST(date_diff('day',
      |              CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      |              CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
      |FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          datediff(to_date($"o_orderdate"), to_date(lag($"o_orderdate", 1).over(w)))
            .cast("int").as("days_since_prev"))
  }

  /** Global top-k: orderBy + limit → TakeOrderedAndProject (O(n) scan with
    * a k-heap per partition, no global sort).
    */
  val topkGlobal = Q("o1_topk_global",
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", dec2($"o_totalprice").cast("double").as("total"))
  }

  /** O2: KEYSET (seek-method) PAGINATION — page 2 of o1's ordering,
    * fetched by composite-key anchor instead of OFFSET: the client-held
    * last-seen `(total, orderkey)` becomes the literal predicate
    * `total < a ∨ (total = a ∧ key > k)`, which PUSHES DOWN to the scan
    * (PlanSpec pins the `Or(LessThan…)` in PushedFilters). OFFSET n
    * re-ranks n rows on every page; the seek predicate makes every page
    * the same O(scan-after-skipping) TakeOrdered — the only pagination
    * that survives deep pages at 100 TB. The anchor here is derived by a
    * 1-row k-bounded collect standing in for the client's cursor.
    */
  val keysetPagination = Q("o2_keyset_pagination",
    """WITH p1 AS (SELECT o_totalprice AS p, o_orderkey AS k FROM orders
      |            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10),
      |anchor AS (SELECT p, k FROM p1 ORDER BY p ASC, k DESC LIMIT 1)
      |SELECT o.o_orderkey, CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders o, anchor a
      |WHERE o.o_totalprice < a.p OR (o.o_totalprice = a.p AND o.o_orderkey > a.k)
      |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val page1Last = Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .orderBy($"o_totalprice".asc, $"o_orderkey".desc)
        .limit(1)
        .select($"o_totalprice", $"o_orderkey")
        .head() // the client's cursor: 1 row
      val (aP, aK) = (page1Last.getDouble(0), page1Last.getLong(1))
      Tables.orders(s, dir)
        .filter($"o_totalprice" < aP
          || ($"o_totalprice" === aP && $"o_orderkey" > aK))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"o_orderkey", dec2($"o_totalprice").cast("double").as("total"))
  }

  /** W5: the ranking-function family in one query — rank / dense_rank /
    * percent_rank / cume_dist / ntile over each customer's order history.
    * percent_rank = (rank−1)/(n−1) and cume_dist = rank_max/n are single
    * IEEE divisions of exact integers → bit-identical cross-engine. One
    * shuffle on the partition key, like every window here.
    */
  val rankFamily = Q("w5_rank_family",
    """SELECT o_custkey, o_orderkey,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |       percent_rank() OVER w AS prnk,
      |       cume_dist() OVER w AS cdist,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
  }

  /** W13: the value-picking window family — first_value / last_value /
    * nth_value over an explicit whole-partition ROWS frame. last_value
    * needs the UNBOUNDED FOLLOWING frame spelled out (the default frame
    * ends at CURRENT ROW, where last_value degenerates to the row
    * itself — a classic silent bug this query pins). The functions only
    * pick values (no arithmetic), so the decimal→double emission is
    * exact on both engines; ordering is total via the o_orderkey tiebreak.
    * One shuffle on the partition key, like every window here.
    */
  val valueFrames = Q("w13_frames",
    """SELECT o_custkey, o_orderkey,
      |       CAST(first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS first_price,
      |       CAST(last_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS last_price,
      |       CAST(nth_value(CAST(o_totalprice AS DECIMAL(18,2)), 2) OVER w AS DOUBLE) AS second_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select($"o_custkey", $"o_orderkey",
          first_value(dec2($"o_totalprice")).over(w).cast("double").as("first_price"),
          last_value(dec2($"o_totalprice")).over(w).cast("double").as("last_price"),
          nth_value(dec2($"o_totalprice"), 2).over(w).cast("double").as("second_price"))
  }

  /** W15: RUNNING DISTINCT COUNT — cumulative distinct customers by
    * order month (the "total customers acquired" growth curve).
    * `count(DISTINCT) OVER (ORDER BY …)` is unsupported (and would be
    * quadratic anyway); the scalable idiom is first-occurrence
    * reduction: min(first month) per customer (one fact aggregate),
    * new-customer counts per month (tiny second aggregate), cumulative
    * sum over months (window over ~month-count rows). The fact is
    * touched once; the window input is the MONTH table, not the orders.
    * Months acquiring zero new customers carry no row (the cumulative
    * value is unchanged there by construction).
    */
  val runningDistinct = Q("w15_running_distinct",
    """WITH f AS (SELECT o_custkey, CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS first_month
      |           FROM orders GROUP BY 1),
      |d AS (SELECT first_month AS month, count(*) AS new_customers FROM f GROUP BY 1)
      |SELECT month, new_customers,
      |       CAST(sum(new_customers) OVER (ORDER BY month
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS cum_distinct_customers
      |FROM d""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val firstMonth = Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(min(date_trunc("month", $"o_orderdate")).cast("date").as("first_month"))
      val w = Window.orderBy($"month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstMonth
        .groupBy($"first_month".as("month"))
        .agg(count(lit(1)).as("new_customers"))
        .select($"month", $"new_customers",
          sum($"new_customers").over(w).cast("long").as("cum_distinct_customers"))
  }

  /** W16: HOPPING time windows — Spark's native `window(ts, size, slide)`
    * generator (the batch face of the streaming windowed-agg surface,
    * §2.8): every event lands in size/slide = 2 overlapping 10-minute
    * windows, aggregated per (window start, event_type). The oracle
    * replays Spark's epoch-aligned window assignment arithmetic
    * (start = slide·⌊t/slide⌋ − k·slide) per event. Money-free exactness:
    * the double `value` is floored to cents per row before the sum (the
    * same IEEE ops in both engines), so the aggregate is integer.
    *
    * Scale: window() is a generator projection (2 rows per event — no
    * join, no state) feeding one hash aggregate; this is exactly the
    * shape Structured Streaming runs incrementally with a watermark, so
    * the batch gate here pins the semantics the stream inherits.
    */
  val hoppingWindow = Q("w16_hopping_window",
    """WITH e AS (SELECT epoch_us(ts) AS tus, event_type,
      |                  CAST(floor(value * 100) AS BIGINT) AS cents
      |           FROM events),
      |x AS (SELECT (tus // 300000000) * 300000000 - k.k * 300000000 AS win_start_us,
      |             event_type, cents
      |      FROM e, (VALUES (0), (1)) k(k)
      |      WHERE (tus // 300000000) * 300000000 - k.k * 300000000 + 600000000 > tus)
      |SELECT win_start_us, event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(cents) AS BIGINT) AS cents_sum
      |FROM x GROUP BY 1, 2""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(floor($"value" * 100).cast("long")).as("cents_sum"))
        .select(unix_micros($"window.start").as("win_start_us"),
          $"event_type", $"n_events", $"cents_sum")
  }

  /** W17: NATIVE SESSION WINDOWS — `session_window(ts, gap)`, the
    * streaming-capable session operator (in Structured Streaming the same
    * call merges sessions in state), pinned in batch against a manual
    * gap-island replay; the session companion to w16's hopping-window pin
    * (§2.8 batch pins of streaming window semantics). Complements
    * w4: that query builds sessions BY HAND (lag → flag → running sum);
    * this one delegates to Spark's operator and proves the engine's merge
    * rule — a new session starts iff the gap to the previous event is
    * ≥ the gap duration (session end = last event + gap, end-exclusive) —
    * with integer microsecond arithmetic on both sides. One shuffle on
    * user_id, merge cost linear per user — the 100 TB shape.
    */
  val sessionWindow = Q("w17_session_window",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              OR epoch_us(ts) - lag(epoch_us(ts))
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |       epoch_us(min(ts)) AS session_start_us,
      |       epoch_us(max(ts)) + 1800000000 AS session_end_us,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, sid""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(Exact.dec2($"value")).cast("double").as("session_value"))
        .select($"user_id",
          unix_micros($"sw.start").as("session_start_us"),
          unix_micros($"sw.end").as("session_end_us"),
          $"n_events", $"session_value")
  }

  /** W22: RUNNING PEAK + DRAWDOWN — the financial running-max family
    * over the daily revenue series per priority: each day's cumulative
    * revenue, its running peak, and the drawdown (peak − current; here
    * cumulative revenue is monotone so drawdown is structurally 0 for
    * the cumulative column — the interesting series is the DAILY value's
    * drawdown from its own running max, which is what this emits).
    * All windows partition by priority (bounded partitions), integer
    * cents end-to-end.
    */
  val runningDrawdown = Q("w22_running_drawdown",
    """WITH daily AS (
      |  SELECT o_orderpriority AS priority,
      |         epoch_us(o_orderdate) // 86400000000 AS day,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1, 2)
      |SELECT priority, day, rev_cents,
      |       CAST(max(rev_cents) OVER (PARTITION BY priority ORDER BY day
      |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_cents,
      |       CAST(max(rev_cents) OVER (PARTITION BY priority ORDER BY day
      |                                 ROWS UNBOUNDED PRECEDING) - rev_cents AS BIGINT) AS drawdown_cents
      |FROM daily""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"priority").orderBy($"day")
        .rowsBetween(Long.MinValue, 0)
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority".as("priority"),
          expr("unix_micros(o_orderdate) div 86400000000").as("day"))
        .agg(sum((Exact.dec2($"o_totalprice") * 100).cast("long")).as("rev_cents"))
        .select($"priority", $"day", $"rev_cents",
          max($"rev_cents").over(w).cast("long").as("peak_cents"),
          (max($"rev_cents").over(w) - $"rev_cents").cast("long").as("drawdown_cents"))
  }

  /** W23: PERIOD-OVER-PERIOD growth — monthly revenue with
    * month-over-month (lag 1) and year-over-year (lag 12) comparisons,
    * the standard executive trend readout.
    *
    * Growth is emitted as an IEEE double ratio of exact integer cents
    * (both < 2⁵³, so the division is deterministically identical across
    * engines) — NOT an integer-ppm floor: the numerator goes negative in
    * down months, and Spark's `div` truncates toward zero where DuckDB's
    * `//` floors, so an integer-division growth would hash-diverge on
    * exactly the interesting rows. The lag windows run over the
    * \|months\|-row rollup (the documented post-aggregation bounded
    * exception), never the fact.
    */
  val periodOverPeriod = Q("w23_period_over_period",
    """WITH m AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS month_idx,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1)
      |SELECT month_idx, rev_cents,
      |       lag(rev_cents, 1) OVER (ORDER BY month_idx) AS prev_cents,
      |       lag(rev_cents, 12) OVER (ORDER BY month_idx) AS yoy_cents,
      |       CAST(rev_cents - lag(rev_cents, 1) OVER (ORDER BY month_idx) AS DOUBLE)
      |         / CAST(lag(rev_cents, 1) OVER (ORDER BY month_idx) AS DOUBLE) AS mom_growth,
      |       CAST(rev_cents - lag(rev_cents, 12) OVER (ORDER BY month_idx) AS DOUBLE)
      |         / CAST(lag(rev_cents, 12) OVER (ORDER BY month_idx) AS DOUBLE) AS yoy_growth
      |FROM m""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window.orderBy($"month_idx")
      Tables.orders(s, dir)
        .groupBy((year($"o_orderdate") * 12 + month($"o_orderdate")).as("month_idx"))
        .agg(sum((Exact.dec2($"o_totalprice") * 100).cast("long")).as("rev_cents"))
        .select($"month_idx", $"rev_cents",
          lag($"rev_cents", 1).over(w).as("prev_cents"),
          lag($"rev_cents", 12).over(w).as("yoy_cents"))
        .select($"month_idx", $"rev_cents", $"prev_cents", $"yoy_cents",
          (($"rev_cents" - $"prev_cents").cast("double") / $"prev_cents".cast("double"))
            .as("mom_growth"),
          (($"rev_cents" - $"yoy_cents").cast("double") / $"yoy_cents".cast("double"))
            .as("yoy_growth"))
  }

  /** w25: MARKOV TRANSITION MATRIX over the per-user event sequence —
    * the first-order behavioral model (which event follows which) that
    * powers next-action prediction, funnel anomaly detection, and w8's
    * top-paths generalized from literal paths to transition
    * probabilities.
    *
    * Shape: ONE window per user (hash shuffle on the high-cardinality
    * user_id, in-partition sort on (ts, event_id) — the w1 tie-break
    * discipline), then a hash aggregate onto the \|types\|² transition
    * keys (map-side combined — the shuffle moves at most \|types\|² rows
    * per partition regardless of corpus size). The row-probability
    * window runs over the aggregated \|types\|²-row matrix — bounded by
    * the type vocabulary, never the data (the Warehouse post-agg window
    * precedent).
    *
    * Exactness: counts are integers; probabilities are floor-division
    * ppm shares (dq5 discipline) — order-independent at any parallelism.
    */
  val markovTransitions = Q("w25_markov_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |t AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n_transitions,
      |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
      |FROM t""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val seqW = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val t = Tables.events(s, dir)
        .select($"user_id", $"event_type",
          lag($"event_type", 1).over(seqW).as("prev_type"))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type".as("next_type"))
        .agg(count(lit(1)).as("n"))
      t.select($"prev_type", $"next_type", $"n".as("n_transitions"),
        expr("CAST(n * 1000000 div sum(n) OVER (PARTITION BY prev_type) AS BIGINT)")
          .as("p_ppm"))
  }

  /** w26: GROWTH ACCOUNTING — the active-user decomposition every growth
    * dashboard runs: per period, active users split into NEW (first
    * period ever), RETAINED (also active the previous period),
    * RESURRECTED (active before, but not last period), and CHURNED
    * (active last period, gone this period) — with the identity
    * `active(k) = new(k) + retained(k) + resurrected(k)` holding by
    * construction and churn derived as `active(prev) − retained(k)`.
    * The period here is the DAY (the events table spans one month; the
    * month variant is the same query with a month key).
    *
    * Churn attribution: a churn row appears at the NEXT OBSERVED active
    * day (the lag runs over days that exist in the data); across a fully
    * silent day the churn folds into the next observed day's row —
    * deterministic, and exact on any calendar-dense stream.
    *
    * Shape: one distinct to (user, day) — hash aggregate; one user-keyed
    * lag window; one day rollup; the final churn lag runs over the
    * \|days\|-row rollup (bounded by the calendar, the Warehouse
    * post-agg window precedent). All counts exact integers.
    */
  val growthAccounting = Q("w26_growth_accounting",
    """WITH am AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dk
      |  FROM events),
      |seq AS (
      |  SELECT user_id, dk,
      |         lag(dk) OVER (PARTITION BY user_id ORDER BY dk) AS prev
      |  FROM am),
      |cls AS (
      |  SELECT dk,
      |         CAST(count(*) AS BIGINT) AS n_active,
      |         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |         CAST(sum(CASE WHEN prev = dk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |         CAST(sum(CASE WHEN prev IS NOT NULL AND prev < dk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM seq GROUP BY 1)
      |SELECT dk AS day_key, n_active, n_new, n_retained, n_resurrected,
      |       CAST(coalesce(lag(n_active) OVER (ORDER BY dk), 0) - n_retained AS BIGINT)
      |         AS n_churned
      |FROM cls""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val am = Tables.events(s, dir)
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("dk"))
        .distinct()
      val seq = am.select($"user_id", $"dk",
        lag($"dk", 1).over(Window.partitionBy($"user_id").orderBy($"dk")).as("prev"))
      val cls = seq.groupBy($"dk").agg(
        count(lit(1)).as("n_active"),
        sum(when($"prev".isNull, 1L).otherwise(0L)).cast("long").as("n_new"),
        sum(when($"prev" === $"dk" - 1, 1L).otherwise(0L)).cast("long").as("n_retained"),
        sum(when($"prev".isNotNull && $"prev" < $"dk" - 1, 1L).otherwise(0L))
          .cast("long").as("n_resurrected"))
      cls.select($"dk".as("day_key"), $"n_active", $"n_new", $"n_retained",
        $"n_resurrected",
        (coalesce(lag($"n_active", 1).over(Window.orderBy($"dk")), lit(0L))
          - $"n_retained").cast("long").as("n_churned"))
  }

  /** W27: LONGEST ACTIVITY STREAK per user — the gaps-and-islands
    * pattern (day − rank(day) is constant within a consecutive run), the
    * engagement metric behind every retention dashboard. Days are exact
    * integer epoch-days (`epoch_us div 86_400_000_000` — no calendar
    * arithmetic, so no timezone/DST cross-engine hazard), runs are one
    * dense_rank over the per-user distinct-day set, and the result is
    * all-integer.
    *
    * Scale shape: distinct (user, day) is one hash aggregate; the rank
    * and the island grouping both partition by user_id — a single
    * user-keyed shuffle end to end, no self-joins.
    */
  val longestStreak = Q("w27_longest_streak",
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |g AS (
      |  SELECT user_id, day,
      |         day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, count(*) AS run_len, min(day) AS run_start
      |  FROM g GROUP BY 1, 2)
      |SELECT user_id,
      |       CAST(sum(run_len) AS BIGINT) AS n_active_days,
      |       CAST(count(*) AS BIGINT) AS n_streaks,
      |       CAST(max(run_len) AS BIGINT) AS longest_streak,
      |       CAST(min(CASE WHEN run_len = mx THEN run_start END) AS BIGINT) AS longest_start_day
      |FROM (SELECT *, max(run_len) OVER (PARTITION BY user_id) AS mx FROM runs)
      |GROUP BY 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val days = Tables.events(s, dir)
        .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val byUser = Window.partitionBy($"user_id").orderBy($"day")
      val runs = days
        .withColumn("grp", $"day" - dense_rank().over(byUser))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("run_len"), min($"day").as("run_start"))
      runs
        .withColumn("mx", max($"run_len").over(Window.partitionBy($"user_id")))
        .groupBy($"user_id")
        .agg(sum($"run_len").cast("long").as("n_active_days"),
          count(lit(1)).cast("long").as("n_streaks"),
          max($"run_len").cast("long").as("longest_streak"),
          min(when($"run_len" === $"mx", $"run_start")).cast("long").as("longest_start_day"))
  }

  /** W28: INTER-ARRIVAL-TIME histogram — per-user consecutive event gaps
    * bucketed by power of two (the a22 `length(bin(x))−1` idiom, exact on
    * both engines), the load-model diagnostic behind session-gap and
    * burst-window dials (w4's 30-minute gap, w14's burst window, j10's
    * bucket width are all calibrated off exactly this curve). Min/max per
    * bucket ride along so the tail is readable without a second pass.
    * All-integer µs — no float risk.
    *
    * Scale shape: one user-keyed window (the w4 sessionize shuffle) + one
    * hash aggregate onto ≤ 64 bucket keys; output is |buckets| rows.
    */
  val interarrivalHistogram = Q("w28_interarrival_histogram",
    """WITH g AS (
      |  SELECT epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT CAST(length(bin(gap_us)) - 1 AS BIGINT) AS gap_bucket,
      |       CAST(count(*) AS BIGINT) AS n_gaps,
      |       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
      |       CAST(max(gap_us) AS BIGINT) AS max_gap_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select($"user_id", $"event_id", expr("unix_micros(ts)").as("t"))
        .withColumn("gap_us", $"t" - lag($"t", 1).over(
          Window.partitionBy($"user_id").orderBy($"t", $"event_id")))
        .filter($"gap_us".isNotNull)
        .groupBy((length(bin($"gap_us")) - 1).cast("long").as("gap_bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min($"gap_us").cast("long").as("min_gap_us"),
          max($"gap_us").cast("long").as("max_gap_us"))
  }

  val queries: Seq[Q] = Seq(topkPerGroup, runningSum, lagDays, topkGlobal,
    keysetPagination, rankFamily, valueFrames, runningDistinct, hoppingWindow,
    sessionWindow, runningDrawdown, periodOverPeriod, markovTransitions,
    growthAccounting, longestStreak, interarrivalHistogram)
}
