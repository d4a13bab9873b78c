package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Operators beyond the reference's surface that any analytics engine at
  * this tier is expected to provide: sessionization, hierarchical
  * aggregates (ROLLUP), pivot, and as-of joins. Each is expressed as
  * composition of built-ins (SURVEY §4: no custom physical operators
  * needed) and oracle-checked.
  */
object AdvancedOps {

  /** W4: gap-based sessionization of the event stream — the classic
    * lag → new-session flag → running-sum session id, then per-session
    * stats. 30-minute inactivity gap. All per-user windows: one shuffle
    * on user_id.
    */
  val sessionize = Q("w4_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      // BOTH windows (flag and running-sum) order by (ts, event_id): the
      // event_id tiebreak keeps same-timestamp events in one order across
      // the two windows and across engines — oracle SQL pins the same pair
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapUs = 30L * 60 * 1000000 // 30 min in µs
      val tsUs = unix_micros($"ts")
      val flagged = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", $"value", tsUs.as("ts_us"))
        .withColumn("new_session",
          when(lag($"ts_us", 1).over(byUser).isNull
            || $"ts_us" - lag($"ts_us", 1).over(byUser) > gapUs, 1).otherwise(0))
      flagged
        .withColumn("session_id",
          sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max($"ts_us") - min($"ts_us")).as("duration_us"),
          sum(Exact.dec2($"value")).cast("double").as("session_value"))
  }

  /** A8: hierarchical aggregate — ROLLUP over region ⊃ nation with an
    * exact grand total; `grouping()` flags distinguish subtotal rows.
    */
  val rollupAgg = Q("a8_rollup",
    """SELECT coalesce(r.r_name, '(all)') AS region,
      |       coalesce(n.n_name, '(all)') AS nation,
      |       CAST(grouping(r.r_name) AS INT) AS is_region_total,
      |       CAST(grouping(n.n_name) AS INT) AS is_nation_total,
      |       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
      |       count(*) AS n_customers
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(
          grouping($"r_name").cast("int").as("is_region_total"),
          grouping($"n_name").cast("int").as("is_nation_total"),
          sum(Exact.dec2($"c_acctbal")).cast("double").as("total_balance"),
          count(lit(1)).as("n_customers"))
        .select(
          coalesce($"r_name", lit("(all)")).as("region"),
          coalesce($"n_name", lit("(all)")).as("nation"),
          $"is_region_total", $"is_nation_total",
          $"total_balance", $"n_customers")
  }

  /** A9: CUBE — all four grouping-set combinations over
    * (returnflag, linestatus) with grouping flags; completes the
    * hierarchical-aggregate family next to A8's ROLLUP. Same exact-decimal
    * discipline for the double sum.
    */
  val cubeAgg = Q("a9_cube",
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       CAST(grouping(l_returnflag) AS INT) AS is_rf_total,
      |       CAST(grouping(l_linestatus) AS INT) AS is_ls_total,
      |       count(*) AS n_items,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(
          grouping($"l_returnflag").cast("int").as("is_rf_total"),
          grouping($"l_linestatus").cast("int").as("is_ls_total"),
          count(lit(1)).as("n_items"),
          sum(Exact.dec2($"l_quantity")).cast("double").as("total_qty"))
        .select(
          coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
          coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
          $"is_rf_total", $"is_ls_total", $"n_items", $"total_qty")
  }

  /** P9: pivot — revenue by order-year × market segment. The Spark side
    * uses the native `pivot`; the oracle spells out the equivalent
    * conditional aggregation (engine-portable and column-name-stable).
    */
  val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  val pivotRevenue = Q("p9_pivot", {
    val cols = segments.map(seg =>
      s"CAST(sum(CASE WHEN c.c_mktsegment = '$seg' THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $seg")
      .mkString(",\n      |       ")
    s"""SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
      |       $cols
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(year($"o_orderdate").as("order_year"))
        .pivot($"c_mktsegment", segments)
        .agg(sum(Exact.dec2($"o_totalprice")).cast("double"))
  }

  /** J5: as-of join — for each event, the customer's most recent order at
    * event time (backward as-of on the time axis, keyed by customer).
    * Spark lacks a native as-of join; the standard composition: union the
    * two streams tagged, sort per key by time, propagate the last seen
    * order with `last(ignoreNulls)` over the merged timeline, keep event
    * rows. One shuffle on the key — same cost shape as a window. The
    * DuckDB oracle uses its native ASOF JOIN (match on o_orderdate ≤
    * event_time).
    */
  val asofJoin = Q("j5_asof_join",
    """SELECT e.event_id, e.user_id, o.o_orderkey AS last_order_key
      |FROM (SELECT event_id, user_id, ts::TIMESTAMP AS event_time FROM events) e
      |ASOF LEFT JOIN (SELECT max(o_orderkey) AS o_orderkey, o_custkey, o_orderdate
      |                FROM orders GROUP BY o_custkey, o_orderdate) o
      |  ON e.user_id = o.o_custkey AND e.event_time >= o.o_orderdate""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      // µs timeline on both sides (unix_micros of both timestamps)
      val events = Tables.events(s, dir)
        .select($"user_id".as("k"), unix_micros($"ts").as("t_us"),
          $"event_id", lit(null).cast("long").as("o_orderkey"), lit(1).as("is_event"))
      // ties on (customer, time) are resolved to the max order key BEFORE
      // the as-of (ASOF's pick among equal timestamps is engine-defined)
      val orders = Tables.orders(s, dir)
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(max($"o_orderkey").as("o_orderkey"))
        .select($"o_custkey".as("k"), unix_micros($"o_orderdate").as("t_us"),
          lit(null).cast("long").as("event_id"), $"o_orderkey", lit(0).as("is_event"))
      // merged timeline; at equal t_us the order sorts first (is_event 0<1)
      // so an event at exactly the order time sees it — DuckDB ASOF >= ditto.
      // Tiebreak on o_orderkey DESC so simultaneous orders resolve to the
      // LATEST key, matching ASOF's greatest-qualifying-row semantics.
      val w = Window.partitionBy($"k")
        .orderBy($"t_us", $"is_event", desc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders.unionByName(events)
        .withColumn("last_order_key", last($"o_orderkey", ignoreNulls = true).over(w))
        .filter($"is_event" === 1)
        .select($"event_id", $"k".as("user_id"), $"last_order_key")
  }

  /** J6: pure range (interval) join — NO equi key anywhere: for each
    * purchase event, count error events from ANY user in the 10 minutes
    * before it. Naively this is a cartesian with a range predicate
    * (BroadcastNestedLoopJoin — the classic Spark range-join trap); the
    * distributed shape is TIME BUCKETING: quantize both sides to
    * window-sized buckets, a probe's window spans ≤ 2 buckets
    * (⌈w/bucket⌉+1 in general), equi-join on the bucket id, verify the
    * exact range in-bucket. Cost is Σ per-bucket products — linear for
    * time-uniform streams — and the plan is a plain hash join
    * (PlanSpec-asserted cartesian-free). DuckDB's oracle uses its native
    * IEJoin range join; results are identical integer counts.
    */
  val rangeJoin = Q("j6_range_join",
    """WITH p AS (SELECT event_id, epoch_us(ts) AS t_us FROM events
      |           WHERE event_type = 'purchase'),
      |err AS (SELECT epoch_us(ts) AS e_us FROM events WHERE event_type = 'error'),
      |cnt AS (SELECT p.event_id, count(*) AS n_errors
      |        FROM p JOIN err
      |          ON err.e_us >= p.t_us - 600000000 AND err.e_us < p.t_us
      |        GROUP BY 1)
      |SELECT p.event_id, coalesce(c.n_errors, 0) AS n_errors
      |FROM p LEFT JOIN cnt c ON p.event_id = c.event_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val win = 600000000L // 10 min in µs; bucket size == window size
      val ev = Tables.events(s, dir)
        .select($"event_id", $"event_type", unix_micros($"ts").as("t_us"))
      val p = ev.filter($"event_type" === "purchase").select($"event_id", $"t_us")
      val err = ev.filter($"event_type" === "error")
        .select($"t_us".as("e_us"), expr(s"t_us div $win").as("bucket"))
      val pb = p.withColumn("bucket", explode(array_distinct(array(
        expr(s"(t_us - $win) div $win"), expr(s"t_us div $win")))))
      val cnt = pb.join(err, "bucket")
        .filter($"e_us" >= $"t_us" - win && $"e_us" < $"t_us")
        .groupBy($"event_id").agg(count(lit(1)).as("n_errors"))
      p.join(cnt, Seq("event_id"), "left")
        .select($"event_id", coalesce($"n_errors", lit(0L)).as("n_errors"))
  }

  /** W19: PEAK CONCURRENT SESSIONS per day — the sweep-line interval
    * counter: every w4 gap-session contributes +1 at its start and −1
    * one µs after its last event (half-open activity), and concurrency
    * at any change point is the global running sum of deltas.
    *
    * The global running sum is THE single-partition-window trap (`OVER
    * (ORDER BY …)` with no partition collapses to one task); here it
    * runs through `operators/PrefixScan` — per-day bucket totals →
    * exclusive prefix offsets (|days| rows) → broadcast back + parallel
    * within-day windows. The day bucket is monotone in t_us, so
    * offset + local prefix ≡ the global prefix exactly.
    *
    * Tie order at the same µs is pinned (delta ASC: an ending session
    * frees its slot before a starting one claims; then user/session id)
    * so the running value — not just the final sum — is deterministic
    * on both engines.
    */
  val peakConcurrency = Q("w19_peak_concurrency",
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess_events AS (
      |  SELECT user_id, ts,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_id,
      |         min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
      |  FROM sess_events GROUP BY user_id, session_id),
      |deltas AS (
      |  SELECT s_us AS t_us, 1 AS delta, user_id, session_id FROM sess
      |  UNION ALL
      |  SELECT e_us + 1 AS t_us, -1 AS delta, user_id, session_id FROM sess),
      |run AS (
      |  SELECT t_us, sum(delta) OVER (ORDER BY t_us, delta, user_id, session_id
      |                                ROWS UNBOUNDED PRECEDING) AS conc
      |  FROM deltas)
      |SELECT strftime(make_timestamp(t_us), '%Y-%m-%d') AS day,
      |       CAST(max(conc) AS BIGINT) AS peak_concurrency,
      |       count(*) AS n_changes
      |FROM run GROUP BY 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapUs = 30L * 60 * 1000000
      val sess = Tables.events(s, dir)
        .select($"user_id", $"ts", $"event_id", unix_micros($"ts").as("ts_us"))
        .withColumn("new_session",
          when(lag($"ts_us", 1).over(byUser).isNull
            || $"ts_us" - lag($"ts_us", 1).over(byUser) > gapUs, 1).otherwise(0))
        .withColumn("session_id",
          sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(min($"ts_us").as("s_us"), max($"ts_us").as("e_us"))
      val deltas = sess.select($"s_us".as("t_us"), lit(1L).as("delta"),
          $"user_id", $"session_id")
        .unionByName(sess.select(($"e_us" + 1).as("t_us"), lit(-1L).as("delta"),
          $"user_id", $"session_id"))
      val run = graft.operators.PrefixScan.runningSum(deltas,
        bucket = expr("t_us div 86400000000"),
        order = Seq($"t_us", $"delta", $"user_id", $"session_id"),
        value = $"delta", out = "conc")
      run.groupBy(date_format(timestamp_micros($"t_us"), "yyyy-MM-dd").as("day"))
        .agg(max($"conc").cast("long").as("peak_concurrency"),
          count(lit(1)).as("n_changes"))
  }

  /** J11: NEAREST-neighbor join in time — j5's bidirectional completion:
    * for each ORDER, the same customer's nearest event within ±24 h by
    * ABSOLUTE time distance (asof can only look one way; sensor/log
    * alignment wants the closest reading either side). Ties (equidistant
    * before/after) resolve to the EARLIER event, then event_id — a total
    * order both engines share.
    *
    * Shape: the j6 bucket trick with a key — equi-join on (customer,
    * day-bucket) where the order side explodes to the ≤ 3 buckets its
    * ±24 h window can touch (constant fanout), exact |Δ| ≤ 24 h verify
    * in-bucket, rank-1 window per order. One hash join + one keyed
    * window; never a time-only range join, never a cartesian. The DuckDB
    * oracle states the same thing as a key equi-join with the band as a
    * residual predicate.
    */
  val nearestEventJoin = Q("j11_nearest_event_join",
    """WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_us FROM orders),
      |e AS (SELECT event_id, user_id, epoch_us(ts) AS e_us FROM events),
      |cand AS (
      |  SELECT o.o_orderkey, e.event_id, abs(e.e_us - o.o_us) AS dist_us, e.e_us,
      |         row_number() OVER (PARTITION BY o.o_orderkey
      |                            ORDER BY abs(e.e_us - o.o_us), e.e_us, e.event_id) AS rnk
      |  FROM o JOIN e ON o.o_custkey = e.user_id
      |               AND e.e_us >= o.o_us - 86400000000
      |               AND e.e_us <= o.o_us + 86400000000)
      |SELECT o.o_orderkey,
      |       c.event_id AS nearest_event_id,
      |       c.dist_us AS dist_us
      |FROM o LEFT JOIN (SELECT * FROM cand WHERE rnk = 1) c
      |  ON o.o_orderkey = c.o_orderkey""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val win = 86400000000L // ±24 h in µs; bucket size == window size
      val o = Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", unix_micros($"o_orderdate").as("o_us"))
      val e = Tables.events(s, dir)
        .select($"event_id", $"user_id", unix_micros($"ts").as("e_us"),
          expr(s"unix_micros(ts) div $win").as("bucket"))
      val ob = o.withColumn("bucket", explode(array_distinct(array(
        expr(s"(o_us - $win) div $win"), expr(s"o_us div $win"),
        expr(s"(o_us + $win) div $win")))))
      val w = Window.partitionBy($"o_orderkey")
        .orderBy(abs($"e_us" - $"o_us"), $"e_us", $"event_id")
      val best = ob.join(e, $"o_custkey" === $"user_id" && ob("bucket") === e("bucket"))
        .filter(abs($"e_us" - $"o_us") <= win)
        // the same event can match through two buckets of one order —
        // dedupe before ranking so rnk counts events, not bucket copies
        .select($"o_orderkey", $"event_id", $"e_us", $"o_us").distinct()
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" === 1)
        .select($"o_orderkey".as("c_orderkey"), $"event_id".as("nearest_event_id"),
          abs($"e_us" - $"o_us").as("dist_us"))
      o.join(best, $"o_orderkey" === $"c_orderkey", "left")
        .select($"o_orderkey", $"nearest_event_id", $"dist_us")
  }

  val queries: Seq[Q] = Seq(sessionize, rollupAgg, cubeAgg, pivotRevenue, asofJoin,
    rangeJoin, peakConcurrency, nearestEventJoin)
}
