package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H completion pack — the remaining classic decision-support shapes
  * (Q2, Q8, Q9, Q10, Q11, Q13, Q15, Q16, Q17, Q20, Q21, Q22) adapted to
  * the carried columns (the testdata has no partsupp table and no
  * commit/receipt dates; each adaptation keeps the ORIGINAL optimizer
  * shape — correlated min, global-scalar HAVING, nested semi chains,
  * exists + not-exists on the same fact — and swaps only the predicate
  * columns). Money follows the repo Exact decimal discipline throughout.
  *
  * Scale notes (100 TB):
  *  - every query's fact-side predicates reach the parquet scan; dims
  *    (part 2k, supplier 100, customer 1.5k, nation, region) broadcast;
  *  - correlated aggregates (q2 min, q17 avg) are decorrelated by hand
  *    into grouped sub-aggregates joined back on the key — the fact
  *    shuffles once per distinct key set, never per-row subquery;
  *  - global scalars (q11 threshold, q15 max, q22 avg) are 1-row
  *    broadcast cross joins off a cached sub-aggregate — the sub-agg is
  *    computed ONCE (cache), not re-derived per consumer;
  *  - q21's exists/not-exists pair folds into ONE per-order aggregate
  *    (any/none flags) instead of two extra fact joins — at 100 TB that
  *    is one shuffle of (orderkey, 2 bits) instead of two self-joins.
  */
object Warehouse2 {

  /** Q10-shaped: top returned-revenue customers for one quarter.
    * Join pyramid orders(quarter)⋈lineitem(R)⋈customer⋈nation; the
    * customer+nation side broadcasts; deterministic top-20 via
    * (revenue DESC, custkey) so the LIMIT is tie-stable cross-engine.
    */
  val q10Returned = Q("q10_returned_customers",
    """SELECT c.c_custkey AS custkey, c.c_name AS cust_name, n.n_name AS nation,
      |       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
      |       CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |              * CAST(1.0 - l.l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, custkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    import s.implicits._
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-10-01").cast("timestamp")
        && $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(s, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy(
        $"c_custkey".as("custkey"), $"c_name".as("cust_name"),
        $"n_name".as("nation"), Exact.cents($"c_acctbal").as("acctbal"))
      .agg(Exact.cents(sum(Exact.dec2($"l_extendedprice")
        * Exact.dec4(lit(1.0) - $"l_discount"))).as("revenue"))
      .orderBy($"revenue".desc, $"custkey")
      .limit(20)
  }

  /** Q13-shaped: customer order-count distribution. LEFT join with the
    * filter INSIDE the join condition (the Q13 signature — moving it to
    * WHERE would drop zero-order customers), then a two-level aggregate.
    * Second shuffle is on the tiny (c_count) domain.
    */
  val q13CustDist = Q("q13_custdist",
    """WITH co AS (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist
      |FROM co GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val c = Tables.customer(s, dir).select($"c_custkey")
    val o = Tables.orders(s, dir).select($"o_custkey", $"o_orderkey", $"o_orderpriority")
    c.join(o, $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q15-shaped: supplier(s) achieving the maximum 3-month revenue.
    * The revenue sub-aggregate is computed ONCE and cached; the global
    * max is a 1-row broadcast; the equality re-join is EXACT because
    * revenue stays DECIMAL until the final projection (a double equality
    * here would flap cross-engine).
    */
  val q15TopSupplier = Q("q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS suppkey,
      |         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * CAST(1.0 - l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
      |       CAST(r.total_rev AS DOUBLE) AS total_revenue
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.suppkey
      |WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .groupBy($"l_suppkey".as("suppkey"))
      .agg(sum(Exact.dec2($"l_extendedprice")
        * Exact.dec4(lit(1.0) - $"l_discount"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("total_rev"))
      .cache()
    val mx = rev.agg(max($"total_rev").as("max_rev"))
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_name")
    rev.crossJoin(broadcast(mx))
      .filter($"total_rev" === $"max_rev")
      .join(broadcast(sup), $"suppkey" === $"s_suppkey")
      .select($"s_suppkey".as("suppkey"), $"s_name".as("supplier_name"),
        $"total_rev".cast("double").as("total_revenue"))
  }

  /** Q11-shaped: parts whose shipped value (through suppliers of three
    * nations) exceeds a fraction of the group's global total — the
    * group-HAVING-vs-global-scalar shape. The per-part aggregate is
    * cached and consumed twice (rows + global sum); the threshold
    * comparison stays in exact decimal.
    */
  val q11ImportantParts = Q("q11_important_parts",
    """WITH v AS (
      |  SELECT l.l_partkey AS partkey,
      |         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS part_value
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE s.s_nationkey IN (2, 7, 12)
      |  GROUP BY 1)
      |SELECT partkey, CAST(part_value AS DOUBLE) AS part_value
      |FROM v
      |WHERE part_value * 1000 > (SELECT sum(part_value) FROM v)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val sup = Tables.supplier(s, dir)
      .filter($"s_nationkey".isin(2, 7, 12)).select($"s_suppkey")
    val v = Tables.lineitem(s, dir)
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey".as("partkey"))
      .agg(sum(Exact.dec2($"l_extendedprice"))
        .cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("part_value"))
      .cache()
    val tot = v.agg(sum($"part_value").as("total_value"))
    v.crossJoin(broadcast(tot))
      .filter($"part_value" * 1000 > $"total_value")
      .select($"partkey", $"part_value".cast("double").as("part_value"))
  }

  /** Q17-shaped: revenue impact of small-quantity orders for one brand.
    * The correlated per-part AVG is decorrelated into a grouped
    * aggregate joined back on partkey. l_quantity is integer-valued, so
    * the double avg (exact integer sum / exact count) is IEEE-identical
    * cross-engine, and so is the 0.2× threshold compare.
    */
  val q17SmallQuantity = Q("q17_small_quantity",
    """WITH pa AS (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY 1)
      |SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      |       count(*) AS n_lines
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN pa ON pa.l_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.2 * pa.avg_qty""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pa = Tables.lineitem(s, dir)
      .groupBy($"l_partkey".as("pa_partkey"))
      .agg(avg($"l_quantity").as("avg_qty"))
    val p = Tables.part(s, dir)
      .filter($"p_brand" === "Brand#13").select($"p_partkey")
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
      .join(pa, $"l_partkey" === $"pa_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg(
        (sum(Exact.dec2($"l_extendedprice")).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** Q2-shaped: for each mid-size LARGE part, the EUROPE supplier(s)
    * with the minimal account balance among those who actually shipped
    * it — the correlated-min shape, decorrelated into a per-part min
    * joined back on (partkey, acctbal). Equality on acctbal is on the
    * exact 2-dp decimal.
    */
  val q2MinSupplier = Q("q2_min_balance_supplier",
    """WITH elig AS (
      |  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
      |         CAST(s.s_acctbal AS DECIMAL(18,2)) AS bal, s.s_name, n.n_name
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |  WHERE r.r_name = 'EUROPE'),
      |mins AS (SELECT partkey, min(bal) AS min_bal FROM elig GROUP BY 1)
      |SELECT p.p_partkey AS partkey, p.p_name AS part_name, e.s_name AS supplier_name,
      |       e.n_name AS nation, CAST(e.bal AS DOUBLE) AS acctbal
      |FROM part p
      |JOIN elig e ON e.partkey = p.p_partkey
      |JOIN mins m ON m.partkey = p.p_partkey AND e.bal = m.min_bal
      |WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'""".stripMargin) { (s, dir) =>
    import s.implicits._
    val supEurope = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"n_name", Exact.dec2($"s_acctbal").as("bal"))
    val p = Tables.part(s, dir)
      .filter($"p_size".between(10, 15) && $"p_type" === "LARGE")
      .select($"p_partkey", $"p_name")
    // only (part, supplier) pairs for qualifying parts reach the min
    val elig = Tables.lineitem(s, dir)
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
      .select($"l_partkey".as("partkey"), $"l_suppkey").distinct()
      .join(broadcast(supEurope), $"l_suppkey" === $"s_suppkey")
      .cache()
    val mins = elig.groupBy($"partkey".as("m_partkey"))
      .agg(min($"bal").as("min_bal"))
    elig
      .join(broadcast(mins), $"partkey" === $"m_partkey" && $"bal" === $"min_bal")
      .join(broadcast(p), $"partkey" === $"p_partkey")
      .select($"p_partkey".as("partkey"), $"p_name".as("part_name"),
        $"s_name".as("supplier_name"), $"n_name".as("nation"),
        $"bal".cast("double").as("acctbal"))
  }

  /** Q6-shaped: the forecast-revenue-change scan-aggregate — one year,
    * a discount band, a quantity cap, no joins at all. The whole query
    * is a single parquet scan with every predicate pushed and a 1-row
    * decimal aggregate; at 100 TB it is purely scan-bandwidth-bound
    * (the year predicate prunes row groups on l_shipdate statistics).
    * Discounts are clean 2-dp factors, so the band is closed under the
    * exact decimal cast.
    */
  val q6ForecastRevenue = Q("q6_forecast_revenue",
    """SELECT CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |            * CAST(l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS revenue_change,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND CAST(l_discount AS DECIMAL(18,4)) BETWEEN CAST(0.05 AS DECIMAL(18,4))
      |                                            AND CAST(0.07 AS DECIMAL(18,4))
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1998-01-01").cast("timestamp")
        && Exact.dec4($"l_discount").between(
          Exact.dec4(lit(0.05)), Exact.dec4(lit(0.07)))
        && $"l_quantity" < 24)
      .agg(
        Exact.cents(sum(Exact.dec2($"l_extendedprice")
          * Exact.dec4($"l_discount"))).as("revenue_change"),
        count(lit(1)).as("n_lines"))
  }

  /** Q8-shaped: per order-year market share of one supplying nation
    * within ASIA-customer STANDARD-part volume. The widest join pyramid
    * in the pack (fact ⋈ orders ⋈ customer-side geo ⋈ supplier-side geo
    * ⋈ part); every dim broadcasts, the share is a conditional/total
    * ratio of exact decimal sums.
    */
  val q8MarketShare = Q("q8_market_share",
    """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
      |       CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
      |              THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                   * CAST(1.0 - l.l_discount AS DECIMAL(18,4))
      |              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                   * CAST(1.0 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS mkt_share,
      |       CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |              * CAST(1.0 - l.l_discount AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS total_volume
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |JOIN region r ON n1.n_regionkey = r.r_regionkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
    val custAsia = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey", "left_semi")
      .select($"c_custkey")
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val p = Tables.part(s, dir)
      .filter($"p_type" === "STANDARD").select($"p_partkey")
    val vol = Exact.dec2($"l_extendedprice") * Exact.dec4(lit(1.0) - $"l_discount")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_partkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custAsia), $"o_custkey" === $"c_custkey", "left_semi")
      .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year".cast("int").as("o_year"))
      .agg(
        sum(when($"supp_nation" === "NATION_2", vol)
          .otherwise(Exact.dec2(lit(0)))).cast("double").as("nation_volume"),
        sum(vol).cast("double").as("denom"),
        Exact.cents(sum(vol)).as("total_volume"))
      .select($"o_year", ($"nation_volume" / $"denom").as("mkt_share"), $"total_volume")
  }

  /** Q9-shaped: profit by supplier nation × order year. No partsupp
    * cost column exists, so cost is the deterministic proxy
    * 0.6 × p_retailprice × l_quantity — all-decimal, so the profit sum
    * is exact. One fact pass, every dim broadcast.
    */
  val q9Profit = Q("q9_profit",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
      |       CAST(CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1.0 - l.l_discount AS DECIMAL(18,4))
      |              - CAST(p.p_retailprice AS DECIMAL(18,2))
      |                * CAST(0.6 AS DECIMAL(2,1))
      |                * CAST(l.l_quantity AS DECIMAL(4,0))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS profit
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_name LIKE '%bolt%'
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val p = Tables.part(s, dir)
      .filter($"p_name".contains("bolt"))
      .select($"p_partkey", $"p_retailprice")
    val supNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val o = Tables.orders(s, dir)
      .select($"o_orderkey", year($"o_orderdate").cast("int").as("o_year"))
    val profit = Exact.dec2($"l_extendedprice") * Exact.dec4(lit(1.0) - $"l_discount") -
      Exact.dec2($"p_retailprice")
        .multiply(lit(BigDecimal("0.6")).cast(org.apache.spark.sql.types.DecimalType(2, 1)))
        .multiply($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(4, 0)))
    val factP = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_partkey",
        $"l_extendedprice", $"l_discount", $"l_quantity")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
    // the heavy fact⋈orders join is a WIRED advisor site: disarmed
    // (default) the hand plan defers to Spark's own stats; armed
    // (spark.graft.advisor.arm) PlannedJoin prices and executes its
    // verdict — agreement spec-pinned on the real tables (AdvisorSpec)
    val factO = graft.operators.Advisor.join("q9_lineitem_orders", "auto",
      factP, o.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey")) {
      factP.join(o, $"l_orderkey" === $"o_orderkey")
    }
    factO
      .join(broadcast(supNation), $"l_suppkey" === $"s_suppkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(Exact.cents(sum(profit)).as("profit"))
  }

  /** Q16-shaped: distinct supplier counts per (brand, size) for a part
    * family, excluding a supplier deny-list (NOT IN → broadcast anti
    * join). The distinct-count shuffles (partkey-pruned) fact keys only.
    */
  val q16SupplierCnt = Q("q16_supplier_cnt",
    """SELECT p.p_brand AS brand, p.p_size AS psize,
      |       count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val p = Tables.part(s, dir)
      .filter($"p_brand" =!= "Brand#13" && $"p_type" =!= "PROMO"
        && $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select($"p_partkey", $"p_brand", $"p_size")
    val denied = Tables.supplier(s, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
      .join(broadcast(denied), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand".as("brand"), $"p_size".as("psize"))
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  /** Q20-shaped: suppliers who moved serious volume of a part-name
    * family in one year — the nested IN chain (part-family IN → grouped
    * HAVING IN → supplier semi). l_quantity sums are exact (integer-
    * valued doubles).
    */
  val q20ExcessSuppliers = Q("q20_excess_suppliers",
    """SELECT s.s_name AS supplier_name, n.n_name AS nation
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small %')
      |    AND l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1 HAVING sum(l_quantity) > 300)""".stripMargin) { (s, dir) =>
    import s.implicits._
    val p = Tables.part(s, dir)
      .filter($"p_name".startsWith("small ")).select($"p_partkey")
    val movers = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(p), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 300)
      .select($"l_suppkey")
    Tables.supplier(s, dir)
      .join(broadcast(movers), $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .select($"s_name".as("supplier_name"), $"n_name".as("nation"))
  }

  /** Q21-shaped: suppliers who were the SOLE returning supplier on
    * multi-supplier finished orders (returnflag stands in for the
    * receipt>commit lateness). The classic formulation is
    * EXISTS(other supplier) AND NOT EXISTS(other returning supplier);
    * both collapse into ONE per-order aggregate — supplier count and
    * returning-supplier set — so the fact self-joins ZERO times.
    */
  val q21SoleReturner = Q("q21_sole_returning_supplier",
    """SELECT s.s_name AS supplier_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    // per (order, supplier): did this supplier return anything; per
    // order: #distinct suppliers, #distinct RETURNING suppliers. The
    // exists pair is then pure arithmetic on those counts:
    //   EXISTS other supplier        ⇔ n_supp >= 2
    //   NOT EXISTS other returner    ⇔ n_ret_supp == 1 (and this one returns)
    val f = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey")
    val lines = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
      .join(f, $"l_orderkey" === $"o_orderkey", "left_semi")
    val perOrderSupp = lines
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(
        max(when($"l_returnflag" === "R", 1).otherwise(0)).as("did_return"),
        sum(when($"l_returnflag" === "R", 1).otherwise(0)).as("n_ret_lines"))
    // per-order rollup as a WINDOW over the per-(order,supplier) rows —
    // not a second aggregate joined back: one extra shuffle of the
    // already-reduced keys, zero re-scans of the fact
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
    perOrderSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_ret_supp", sum($"did_return").over(w))
      .filter($"did_return" === 1 && $"n_supp" >= 2 && $"n_ret_supp" === 1)
      .join(broadcast(Tables.supplier(s, dir).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name".as("supplier_name"))
      // count one per RETURNING LINE (the SQL counts l1 rows)
      .agg(sum($"n_ret_lines").cast("long").as("numwait"))
  }

  /** Q22-shaped: well-funded customers gone inactive — acctbal above the
    * global positive average (cross-multiplied to stay in exact decimal:
    * bal × n > Σbal avoids a cross-engine avg()) and no orders since
    * 1999 (anti join). custkey%7 stands in for the phone country code.
    */
  val q22GlobalBalance = Q("q22_inactive_balance",
    """WITH g AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS s,
      |         count(*) AS n
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT (c.c_custkey % 7) AS code, count(*) AS numcust,
      |       CAST(CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
      |FROM customer c, g
      |WHERE c.c_acctbal > 0
      |  AND CAST(c.c_acctbal AS DECIMAL(18,2)) * g.n > g.s
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pos = Tables.customer(s, dir).filter($"c_acctbal" > 0)
      .select($"c_custkey", Exact.dec2($"c_acctbal").as("bal"))
      .cache()
    val g = pos.agg(
      sum($"bal").cast(org.apache.spark.sql.types.DecimalType(28, 2)).as("g_sum"),
      count(lit(1)).as("g_n"))
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey")
    pos.crossJoin(broadcast(g))
      .filter($"bal" * $"g_n" > $"g_sum")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy(($"c_custkey" % 7).as("code"))
      .agg(
        count(lit(1)).as("numcust"),
        Exact.cents(sum($"bal")).as("totacctbal"))
  }

  /** DQ3: time-series anomaly detection on the daily revenue KPI — the
    * monitoring control that pages a data team: each day's revenue
    * z-scored against its own trailing 28-day window (frame excludes the
    * current day, so an anomalous day cannot mask itself). The t22
    * integer discipline makes the rolling moments exact cross-engine:
    * daily revenue is exact cents (BIGINT), the frame's Σx and Σx² stay
    * integer/decimal (accumulation-order-independent — at 1000 executors
    * a double rolling sum is a nondeterministic result), and doubles
    * appear only in the final fixed-order (x−s/n)/√var arithmetic. A
    * zero-variance window yields NULL, not an engine-dependent ±inf/NaN.
    * Scale: one shuffle to daily grain (the fact reduces to ~date-count
    * rows), then a single-partition-per-key ordered window over days —
    * thousands of rows regardless of corpus size.
    */
  val dq3KpiAnomaly = Q("dq3_kpi_anomaly",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)))
      |              AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT day, rev_c,
      |         count(*) OVER f AS n,
      |         sum(rev_c) OVER f AS s,
      |         sum(CAST(rev_c AS DECIMAL(38,0)) * rev_c) OVER f AS ss
      |  FROM daily
      |  WINDOW f AS (ORDER BY day ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
      |SELECT day, rev_c, n,
      |       CASE WHEN CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s > 0 THEN
      |         (CAST(rev_c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |           / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
      |                  / CAST(n * (n - 1) AS DOUBLE))
      |       END AS z,
      |       CASE WHEN CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s > 0
      |             AND abs((CAST(rev_c AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |               / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
      |                      / CAST(n * (n - 1) AS DOUBLE))) > 3.0
      |            THEN 1 ELSE 0 END AS is_anomaly
      |FROM w WHERE n >= 14""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.orders(s, dir)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum((Exact.dec2($"o_totalprice") * 100).cast(DecimalType(18, 0)))
        .cast("long").as("rev_c"))
    val f = org.apache.spark.sql.expressions.Window
      .orderBy($"day").rowsBetween(-28, -1)
    val withMoments = daily
      .withColumn("n", count(lit(1)).over(f))
      .withColumn("s", sum($"rev_c").over(f))
      .withColumn("ss", sum($"rev_c".cast(DecimalType(38, 0)) * $"rev_c").over(f))
      .filter($"n" >= 14)
    val varNum = $"n".cast(DecimalType(38, 0)) * $"ss" -
      $"s".cast(DecimalType(38, 0)) * $"s"
    val z = ($"rev_c".cast("double") - $"s".cast("double") / $"n".cast("double")) /
      sqrt(varNum.cast("double") / ($"n" * ($"n" - 1)).cast("double"))
    withMoments.select(
      $"day", $"rev_c", $"n",
      when(varNum > 0, z).as("z"),
      when(varNum > 0 && abs(z) > 3.0, 1).otherwise(0).as("is_anomaly"))
  }

  /** DQ4: REFERENTIAL-INTEGRITY expectations — the orphan screens every
    * warehouse load gate runs: facts without their parent (lineitem →
    * orders, orders → customer) and parents without any child (orders
    * with zero lineitems). Three anti-join counts in one result; a clean
    * load is all-zeros except childless orders (TPC-H generates none,
    * but the check must COUNT, not assume).
    *
    * Scale: each check is one null-producing join on the key — the
    * fact side shuffles once per check on its own key (or broadcasts
    * the parent when it fits, as customer does here); no check ever
    * materializes the violation rows, only counts them.
    */
  val dq4Orphans = Q("dq4_orphan_check",
    """SELECT 'lineitem_without_order' AS chk, CAST(count(*) AS BIGINT) AS n_violations
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderkey IS NULL
      |UNION ALL
      |SELECT 'order_without_customer', CAST(count(*) AS BIGINT)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_custkey IS NULL
      |UNION ALL
      |SELECT 'order_without_lineitem', CAST(count(*) AS BIGINT)
      |FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
      |  ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_orderkey IS NULL""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      def row(name: String,
          n: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        n.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("chk"), $"n_violations")
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      row("lineitem_without_order",
        li.select($"l_orderkey").join(o.select($"o_orderkey"),
          $"l_orderkey" === $"o_orderkey", "left_anti"))
        .unionAll(row("order_without_customer",
          o.select($"o_custkey").join(broadcast(c.select($"c_custkey")),
            $"o_custkey" === $"c_custkey", "left_anti")))
        .unionAll(row("order_without_lineitem",
          o.select($"o_orderkey").join(li.select($"l_orderkey"),
            $"o_orderkey" === $"l_orderkey", "left_anti")))
  }

  /** dq5: DISTRIBUTION-DRIFT surveillance — the PSI-style check a data
    * pipeline runs when a feed's value distribution may have shifted:
    * the order-price histogram of the CURRENT period (1996+) against the
    * REFERENCE period (≤1995), per fixed-width bin.
    *
    * The drift statistic is the χ²-shaped Σ (p−q)²/(p+q) over per-mille^2
    * shares — NOT the textbook PSI: PSI needs ln(p/q), and `ln` is not
    * correctly-rounded in either engine's libm, so the last ulp could
    * diverge and break the hash gate. Shares are exact integer ppm, the
    * per-bin contribution is an exact integer floor-division, and the
    * total is a sum of integers — order-independent at any parallelism
    * (a double Σ over bins would be partial-aggregation-order-dependent).
    *
    * Shape: two filtered aggregates over one scan family, a \|bins\|-row
    * rollup, two 1-row totals broadcast back. Bin count is a constant of
    * the check, never of the data.
    */
  val dq5DistributionDrift = Q("dq5_distribution_drift",
    """WITH b AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000000 AS bin,
      |         CASE WHEN year(o_orderdate) <= 1995 THEN 1 ELSE 0 END AS is_ref
      |  FROM orders),
      |cell AS (
      |  SELECT bin,
      |         CAST(sum(is_ref) AS BIGINT) AS n_ref,
      |         CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
      |  FROM b GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
      |               CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cell),
      |shares AS (
      |  SELECT bin, n_ref, n_cur,
      |         CAST(n_ref * 1000000 // (SELECT t_ref FROM tot) AS BIGINT) AS p_ppm,
      |         CAST(n_cur * 1000000 // (SELECT t_cur FROM tot) AS BIGINT) AS q_ppm
      |  FROM cell)
      |SELECT bin, n_ref, n_cur, p_ppm, q_ppm,
      |       CAST(CASE WHEN p_ppm + q_ppm = 0 THEN 0
      |                 ELSE (p_ppm - q_ppm) * (p_ppm - q_ppm) // (p_ppm + q_ppm)
      |            END AS BIGINT) AS drift_contrib
      |FROM shares""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val b = Tables.orders(s, dir).select(
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 5000000")
          .as("bin"),
        when(year($"o_orderdate") <= 1995, 1L).otherwise(0L).as("is_ref"))
      val cell = b.groupBy($"bin").agg(
        sum($"is_ref").cast("long").as("n_ref"),
        sum(lit(1L) - $"is_ref").cast("long").as("n_cur"))
      val tot = cell.agg(sum($"n_ref").cast("long").as("t_ref"),
        sum($"n_cur").cast("long").as("t_cur"))
      cell.join(broadcast(tot))
        .select($"bin", $"n_ref", $"n_cur",
          expr("CAST(n_ref * 1000000 div t_ref AS BIGINT)").as("p_ppm"),
          expr("CAST(n_cur * 1000000 div t_cur AS BIGINT)").as("q_ppm"))
        .withColumn("drift_contrib",
          when($"p_ppm" + $"q_ppm" === 0, 0L).otherwise(
            expr("CAST((p_ppm - q_ppm) * (p_ppm - q_ppm) div (p_ppm + q_ppm) AS BIGINT)")))
  }

  /** dq6: K-ANONYMITY audit — the data-governance screen run before a
    * dataset leaves the warehouse: group rows by their QUASI-IDENTIFIER
    * tuple (here nation × market segment × account-balance sign — the
    * kind of columns that re-identify when joined to an external set)
    * and surface every equivalence class smaller than k=5, plus the
    * class-size distribution. A release is k-anonymous iff the risky
    * class count is zero; the per-size histogram tells you how far off
    * you are and which generalization (drop/coarsen a column) to apply.
    *
    * One hash aggregate to classes, one |sizes|-row rollup — linear,
    * map-side combinable, the same shape at any scale.
    */
  val dq6KAnonymity = Q("dq6_k_anonymity",
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_sign,
      |         count(*) AS class_size
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(class_size AS BIGINT) AS class_size,
      |       count(*) AS n_classes,
      |       CAST(sum(class_size) AS BIGINT) AS n_rows,
      |       class_size < 5 AS below_k
      |FROM classes GROUP BY class_size""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .groupBy($"c_nationkey", $"c_mktsegment",
          when($"c_acctbal" < 0, "neg").otherwise("nonneg").as("bal_sign"))
        .agg(count(lit(1)).as("class_size"))
        .groupBy($"class_size".cast("long").as("class_size"))
        .agg(count(lit(1)).as("n_classes"),
          sum($"class_size").cast("long").as("n_rows"))
        .select($"class_size", $"n_classes", $"n_rows",
          ($"class_size" < 5).as("below_k"))
  }

  /** DQ7: L-DIVERSITY release audit — dq6's sibling on the second
    * re-identification axis: a k-anonymous class is still unsafe if every
    * member shares the same SENSITIVE value (the homogeneity attack), so
    * each quasi-identifier class also needs ≥ l distinct sensitive
    * values. QI = (nation, segment); the sensitive attribute is the
    * account-balance 1000-band.
    *
    * Exactness: the band is all-integer — euclid-mod then an exact
    * integral division ((cents − mod) div 1e5; floor ≡ truncate on exact
    * multiples, so negative balances band identically on both engines —
    * the w23 `div`-vs-`//` trap dodged by construction).
    *
    * One hash aggregate with a distinct count per class — linear,
    * map-side combinable, the same shape at any scale.
    */
  val dq7LDiversity = Q("dq7_l_diversity",
    """WITH sens AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         (cents - ((cents % 100000 + 100000) % 100000)) // 100000 AS bal_band
      |  FROM (SELECT c_nationkey, c_mktsegment,
      |               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |        FROM customer))
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
      |       count(*) AS class_size,
      |       CAST(count(DISTINCT bal_band) AS BIGINT) AS l_distinct,
      |       count(DISTINCT bal_band) < 3 AS below_l
      |FROM sens GROUP BY 1, 2""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir)
        .select($"c_nationkey".cast("long").as("c_nationkey"), $"c_mktsegment",
          (Exact.dec2($"c_acctbal") * 100).cast("long").as("cents"))
        .withColumn("bal_band",
          expr("(cents - ((cents % 100000 + 100000) % 100000)) div 100000"))
        .groupBy($"c_nationkey", $"c_mktsegment")
        .agg(count(lit(1)).as("class_size"),
          countDistinct($"bal_band").cast("long").as("l_distinct"))
        .select($"c_nationkey", $"c_mktsegment", $"class_size", $"l_distinct",
          ($"l_distinct" < 3).as("below_l"))
  }

  /** dq8: T-CLOSENESS audit — the third leg of the release-privacy triad
    * (dq6 k-anonymity → class too small; dq7 l-diversity → class too
    * uniform; dq8 → class distribution too REVEALING): even a diverse
    * class leaks if its sensitive-value distribution differs sharply
    * from the global one (the skewness attack). Per QI class
    * (nation, segment), the statistic is total variation distance
    * between the class's bal-band distribution (dq7's sensitive
    * attribute) and the corpus-wide band distribution.
    *
    * Exactness: shares floor to ppm (dq5 discipline), so
    * 2·TVD·10⁶ = Σ_bands |p_ppm − q_ppm| is an exact integer. Bands a
    * class never exhibits contribute q_ppm each; rather than densify
    * class × band, the identity Σ_all |p−q| = Σ_{v∈class}(|p−q| − q)
    * + Σ_all q folds the absent bands into ONE broadcast scalar
    * (sum_q_ppm) — no outer join, no spine build.
    *
    * Shape: one hash aggregate to class×band cells, one to the global
    * band histogram (bounded by \|bands\|), the per-class share by a
    * window over cells (partitioned by the class key — same shuffle the
    * final rollup reuses), a broadcast band-share join, one rollup.
    * Linear, map-side combinable, the same plan at any scale.
    */
  val dq8TCloseness = Q("dq8_t_closeness",
    """WITH sens AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         (cents - ((cents % 100000 + 100000) % 100000)) // 100000 AS bal_band
      |  FROM (SELECT c_nationkey, c_mktsegment,
      |               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |        FROM customer)),
      |cell AS (
      |  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n_vb
      |  FROM sens GROUP BY 1, 2, 3),
      |gband AS (SELECT bal_band, count(*) AS g_b FROM sens GROUP BY 1),
      |tot AS (SELECT CAST(sum(g_b) AS BIGINT) AS t FROM gband),
      |gq AS (SELECT bal_band,
      |              CAST(g_b * 1000000 // (SELECT t FROM tot) AS BIGINT) AS q_ppm
      |       FROM gband),
      |sq AS (SELECT CAST(sum(q_ppm) AS BIGINT) AS sum_q FROM gq),
      |p AS (
      |  SELECT c.c_nationkey, c.c_mktsegment, c.n_vb, g.q_ppm,
      |         CAST(c.n_vb * 1000000 //
      |              sum(c.n_vb) OVER (PARTITION BY c.c_nationkey, c.c_mktsegment)
      |              AS BIGINT) AS p_ppm
      |  FROM cell c JOIN gq g ON c.bal_band = g.bal_band),
      |cls AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(sum(n_vb) AS BIGINT) AS class_size,
      |         CAST(sum(abs(p_ppm - q_ppm) - q_ppm) + (SELECT sum_q FROM sq)
      |              AS BIGINT) AS tvd_x2_ppm
      |  FROM p GROUP BY 1, 2)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
      |       class_size, tvd_x2_ppm, tvd_x2_ppm > 1200000 AS above_t
      |FROM cls""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val sens = Tables.customer(s, dir)
        .select($"c_nationkey".cast("long").as("c_nationkey"), $"c_mktsegment",
          (Exact.dec2($"c_acctbal") * 100).cast("long").as("cents"))
        .withColumn("bal_band",
          expr("(cents - ((cents % 100000 + 100000) % 100000)) div 100000"))
      val cell = sens.groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
        .agg(count(lit(1)).as("n_vb"))
      val glob = sens.groupBy($"bal_band").agg(count(lit(1)).as("g_b"))
      val tot = glob.agg(sum($"g_b").cast("long").as("t"))
      val gq = glob.join(broadcast(tot))
        .select($"bal_band", expr("CAST(g_b * 1000000 div t AS BIGINT)").as("q_ppm"))
      val sq = gq.agg(sum($"q_ppm").cast("long").as("sum_q"))
      val clsW = org.apache.spark.sql.expressions.Window
        .partitionBy($"c_nationkey", $"c_mktsegment")
      val p = cell.join(broadcast(gq), Seq("bal_band"))
        .select($"c_nationkey", $"c_mktsegment", $"n_vb", $"q_ppm",
          expr("CAST(n_vb * 1000000 div sum(n_vb) OVER (PARTITION BY c_nationkey, c_mktsegment) AS BIGINT)")
            .as("p_ppm"))
      p.groupBy($"c_nationkey", $"c_mktsegment")
        .agg(sum($"n_vb").cast("long").as("class_size"),
          sum(abs($"p_ppm" - $"q_ppm") - $"q_ppm").as("partial_tvd"))
        .join(broadcast(sq))
        .select($"c_nationkey", $"c_mktsegment", $"class_size",
          ($"partial_tvd" + $"sum_q").cast("long").as("tvd_x2_ppm"))
        .withColumn("above_t", $"tvd_x2_ppm" > 1200000L)
  }

  /** dq9: COLUMN PROFILE — the ANALYZE/profiling operator every warehouse
    * runs on a new feed (and optimizers feed on): per column of `orders`,
    * row count, null count, distinct count, and min/max — numerics
    * normalized to exact integers (cents for money, unix micros for the
    * date — a timestamp rendered to string would hash on engine-specific
    * formatting), strings kept as strings, in ONE long-format table.
    *
    * Shape: ONE aggregation pass computes every column's statistics
    * (Spark plans the multi-distinct via Expand — still a single scan,
    * map-side combined), then the 1-row wide result explodes to
    * \|columns\| rows. At 100 TB this is the only honest profile shape:
    * per-column queries would scan the table \|columns\| times. Distinct
    * counts are exact here (the profile IS a correctness gate); the
    * approximate regime at extreme cardinalities is a20's HLL,
    * deliberately opt-in.
    */
  val dq9ColumnProfile = Q("dq9_column_profile",
    """WITH wide AS MATERIALIZED (
      |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |         CAST(count(o_orderkey) AS BIGINT) AS c_ok,
      |         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd_ok,
      |         min(o_orderkey) AS mn_ok, max(o_orderkey) AS mx_ok,
      |         CAST(count(o_custkey) AS BIGINT) AS c_ck,
      |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_ck,
      |         min(o_custkey) AS mn_ck, max(o_custkey) AS mx_ck,
      |         CAST(count(o_totalprice) AS BIGINT) AS c_tp,
      |         CAST(count(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS nd_tp,
      |         min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mn_tp,
      |         max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS mx_tp,
      |         CAST(count(o_orderdate) AS BIGINT) AS c_od,
      |         CAST(count(DISTINCT o_orderdate) AS BIGINT) AS nd_od,
      |         min(epoch_us(o_orderdate)) AS mn_od, max(epoch_us(o_orderdate)) AS mx_od,
      |         CAST(count(o_orderstatus) AS BIGINT) AS c_os,
      |         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd_os,
      |         min(o_orderstatus) AS mn_os, max(o_orderstatus) AS mx_os,
      |         CAST(count(o_orderpriority) AS BIGINT) AS c_op,
      |         CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nd_op,
      |         min(o_orderpriority) AS mn_op, max(o_orderpriority) AS mx_op
      |  FROM orders)
      |SELECT 'o_orderkey' AS column_name, n_rows, n_rows - c_ok AS n_null,
      |       nd_ok AS n_distinct, mn_ok AS min_num, mx_ok AS max_num,
      |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
      |FROM wide
      |UNION ALL
      |SELECT 'o_custkey', n_rows, n_rows - c_ck, nd_ck, mn_ck, mx_ck,
      |       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM wide
      |UNION ALL
      |SELECT 'o_totalprice_cents', n_rows, n_rows - c_tp, nd_tp, mn_tp, mx_tp,
      |       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM wide
      |UNION ALL
      |SELECT 'o_orderdate_us', n_rows, n_rows - c_od, nd_od, mn_od, mx_od,
      |       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM wide
      |UNION ALL
      |SELECT 'o_orderstatus', n_rows, n_rows - c_os, nd_os,
      |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mn_os, mx_os FROM wide
      |UNION ALL
      |SELECT 'o_orderpriority', n_rows, n_rows - c_op, nd_op,
      |       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mn_op, mx_op FROM wide""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val cents = (Exact.dec2($"o_totalprice") * 100).cast("long")
      val wide = Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"o_orderkey").as("c_ok"), countDistinct($"o_orderkey").as("nd_ok"),
        min($"o_orderkey").as("mn_ok"), max($"o_orderkey").as("mx_ok"),
        count($"o_custkey").as("c_ck"), countDistinct($"o_custkey").as("nd_ck"),
        min($"o_custkey").as("mn_ck"), max($"o_custkey").as("mx_ck"),
        count($"o_totalprice").as("c_tp"), countDistinct(cents).as("nd_tp"),
        min(cents).as("mn_tp"), max(cents).as("mx_tp"),
        count($"o_orderdate").as("c_od"), countDistinct($"o_orderdate").as("nd_od"),
        min(unix_micros($"o_orderdate")).as("mn_od"),
        max(unix_micros($"o_orderdate")).as("mx_od"),
        count($"o_orderstatus").as("c_os"), countDistinct($"o_orderstatus").as("nd_os"),
        min($"o_orderstatus").as("mn_os"), max($"o_orderstatus").as("mx_os"),
        count($"o_orderpriority").as("c_op"), countDistinct($"o_orderpriority").as("nd_op"),
        min($"o_orderpriority").as("mn_op"), max($"o_orderpriority").as("mx_op"))
      val nullN = lit(null).cast("long")
      val nullS = lit(null).cast("string")
      def num(name: String, c: String, nd: String, mn: String, mx: String) =
        struct(lit(name).as("column_name"), $"n_rows",
          ($"n_rows" - col(c)).as("n_null"), col(nd).as("n_distinct"),
          col(mn).cast("long").as("min_num"), col(mx).cast("long").as("max_num"),
          nullS.as("min_str"), nullS.as("max_str"))
      def str(name: String, c: String, nd: String, mn: String, mx: String) =
        struct(lit(name).as("column_name"), $"n_rows",
          ($"n_rows" - col(c)).as("n_null"), col(nd).as("n_distinct"),
          nullN.as("min_num"), nullN.as("max_num"),
          col(mn).as("min_str"), col(mx).as("max_str"))
      wide.select(explode(array(
        num("o_orderkey", "c_ok", "nd_ok", "mn_ok", "mx_ok"),
        num("o_custkey", "c_ck", "nd_ck", "mn_ck", "mx_ck"),
        num("o_totalprice_cents", "c_tp", "nd_tp", "mn_tp", "mx_tp"),
        num("o_orderdate_us", "c_od", "nd_od", "mn_od", "mx_od"),
        str("o_orderstatus", "c_os", "nd_os", "mn_os", "mx_os"),
        str("o_orderpriority", "c_op", "nd_op", "mn_op", "mx_op"))).as("r"))
        .select($"r.*")
  }

  /** a29: one-way ANOVA — does order value differ across priorities more
    * than within them? a27's two-group z-test generalized to k groups:
    * F = (SSB/(k−1)) / (SSW/(N−k)) from per-group exact sufficient
    * statistics (n, Σx, Σx² in the a16 decimal discipline).
    *
    * Exactness: the between-groups term Σ s_g²/n_g is a DOUBLE sum whose
    * value depends on summation ORDER — a distributed `sum()` over group
    * terms would be partial-aggregation-order-dependent and never hash.
    * The t21 pinned-order fold instead: collect the ≤\|groups\| stat rows
    * into a SORTED array and fold left-to-right (`aggregate` /
    * `list_reduce` — identical IEEE order, and DuckDB's first-element
    * seeding ≡ Spark's 0.0 seed because 0+x is exact). Wide decimals
    * (Σx² > 2⁶³) cast to double through VARCHAR on the DuckDB side (the
    * a28 caveat — its int128→double cast is not correctly rounded).
    *
    * Shape: one hash aggregate to \|groups\| rows, one 1-row collect-fold.
    * The array is bounded by the group vocabulary, never the data.
    */
  val a29Anova = Q("a29_anova",
    """WITH e AS (
      |  SELECT o_orderpriority AS grp,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      |  FROM orders),
      |g AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS DECIMAL(18,0)) AS s,
      |         CAST(sum(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(30,0)) AS ss
      |  FROM e GROUP BY 1),
      |one AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k_groups,
      |         CAST(sum(n) AS BIGINT) AS n_total,
      |         CAST(CAST(sum(s) AS VARCHAR) AS DOUBLE) AS s_tot_d,
      |         CAST(CAST(sum(ss) AS VARCHAR) AS DOUBLE) AS ss_tot_d,
      |         list(struct_pack(grp := grp, n := n, s := s) ORDER BY grp) AS lst
      |  FROM g),
      |f AS (
      |  SELECT k_groups, n_total, s_tot_d, ss_tot_d,
      |         list_reduce(
      |           list_transform(lst, x ->
      |             (CAST(CAST(x.s AS VARCHAR) AS DOUBLE) * CAST(CAST(x.s AS VARCHAR) AS DOUBLE))
      |               / CAST(x.n AS DOUBLE)),
      |           (a, b) -> a + b) AS sb
      |  FROM one)
      |SELECT k_groups, n_total,
      |       sb - (s_tot_d * s_tot_d) / CAST(n_total AS DOUBLE) AS ssb_cents2,
      |       ss_tot_d - sb AS ssw_cents2,
      |       ((sb - (s_tot_d * s_tot_d) / CAST(n_total AS DOUBLE))
      |          / CAST(k_groups - 1 AS DOUBLE))
      |         / ((ss_tot_d - sb) / CAST(n_total - k_groups AS DOUBLE)) AS f_stat
      |FROM f""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val e = Tables.orders(s, dir).select(
        $"o_orderpriority".as("grp"),
        (Exact.dec2($"o_totalprice") * 100).cast("long").as("x"))
      val g = e.groupBy($"grp").agg(
        count(lit(1)).as("n"),
        sum($"x").cast(DecimalType(18, 0)).as("s"),
        sum($"x".cast(DecimalType(19, 0)) * $"x").cast(DecimalType(30, 0)).as("ss"))
      val one = g.agg(
        count(lit(1)).as("k_groups"),
        sum($"n").cast("long").as("n_total"),
        sum($"s").cast(DecimalType(19, 0)).cast("double").as("s_tot_d"),
        sum($"ss").cast(DecimalType(32, 0)).cast("double").as("ss_tot_d"),
        sort_array(collect_list(struct($"grp", $"n", $"s"))).as("lst"))
      val folded = one.withColumn("sb",
        expr("""aggregate(lst, CAST(0.0 AS DOUBLE),
                (acc, x) -> acc + (CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE))
                                   / CAST(x.n AS DOUBLE))"""))
      val ssb = $"sb" - ($"s_tot_d" * $"s_tot_d") / $"n_total".cast("double")
      val ssw = $"ss_tot_d" - $"sb"
      folded.select($"k_groups", $"n_total",
        ssb.as("ssb_cents2"), ssw.as("ssw_cents2"),
        ((ssb / ($"k_groups" - 1).cast("double"))
          / (ssw / ($"n_total" - $"k_groups").cast("double"))).as("f_stat"))
  }

  /** p13: ACCUMULATING-SNAPSHOT fact — the Kimball order-lifecycle table:
    * one row per order carrying every milestone timestamp (placed, first
    * ship, last ship), the line count, and the lag measures dashboards
    * slice by. Orders with no lineitems keep NULL milestones (the
    * accumulating snapshot's defining property — rows exist from the
    * FIRST event and fill in as later milestones land; cf. the dq4
    * orphan screen that counts them).
    *
    * Exactness: milestones as unix µs integers; the day lags use the dq7
    * euclid-floor idiom because this testdata CONTAINS ship-before-order
    * rows (measured), where Spark's `div` (truncate) and DuckDB's `//`
    * (floor) would diverge on the negative lags.
    *
    * Shape: one lineitem rollup (hash agg on orderkey, map-side
    * combined) + one key join to orders — at 100 TB both sides shuffle
    * once on the same key.
    */
  val p13AccumulatingSnapshot = Q("p13_accumulating_snapshot",
    """WITH ls AS (
      |  SELECT l_orderkey,
      |         min(epoch_us(l_shipdate)) AS first_ship_us,
      |         max(epoch_us(l_shipdate)) AS last_ship_us,
      |         CAST(count(*) AS BIGINT) AS n_lines
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderkey, o.o_orderstatus,
      |         epoch_us(o.o_orderdate) AS order_us,
      |         ls.first_ship_us, ls.last_ship_us,
      |         coalesce(ls.n_lines, 0) AS n_lines,
      |         ls.first_ship_us - epoch_us(o.o_orderdate) AS d1,
      |         ls.last_ship_us - ls.first_ship_us AS d2
      |  FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey)
      |SELECT o_orderkey, o_orderstatus, order_us, first_ship_us, last_ship_us,
      |       n_lines,
      |       (d1 - ((d1 % 86400000000 + 86400000000) % 86400000000)) // 86400000000
      |         AS days_to_first_ship,
      |       (d2 - ((d2 % 86400000000 + 86400000000) % 86400000000)) // 86400000000
      |         AS ship_span_days
      |FROM j""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ls = Tables.lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(min(unix_micros($"l_shipdate")).as("first_ship_us"),
          max(unix_micros($"l_shipdate")).as("last_ship_us"),
          count(lit(1)).as("n_lines"))
      val j = Tables.orders(s, dir)
        .join(ls, $"o_orderkey" === $"l_orderkey", "left")
        .select($"o_orderkey", $"o_orderstatus",
          unix_micros($"o_orderdate").as("order_us"),
          $"first_ship_us", $"last_ship_us",
          coalesce($"n_lines", lit(0L)).as("n_lines"),
          ($"first_ship_us" - unix_micros($"o_orderdate")).as("d1"),
          ($"last_ship_us" - $"first_ship_us").as("d2"))
      def floorDays(c: String) =
        expr(s"($c - (($c % 86400000000 + 86400000000) % 86400000000)) div 86400000000")
      j.select($"o_orderkey", $"o_orderstatus", $"order_us", $"first_ship_us",
        $"last_ship_us", $"n_lines",
        floorDays("d1").as("days_to_first_ship"),
        floorDays("d2").as("ship_span_days"))
  }

  /** dq10: FRESHNESS audit — the timeliness leg of the DQ suite (dq1
    * validity, dq2 reconciliation, dq4 integrity, dq5 drift, dq9
    * profile): per feed (event type standing in for the feed key), the
    * latest arrival and its lag behind the freshest feed, with a stale
    * flag at the 1-hour SLA. The "is any upstream stuck" check every
    * ingestion dashboard leads with — and it must be computed
    * RELATIVELY (lag vs the freshest feed, not vs wall clock) to stay
    * deterministic and replayable.
    *
    * One hash aggregate to \|feeds\| rows + a 1-row global-max broadcast.
    * All integer µs.
    */
  val dq10Freshness = Q("dq10_freshness",
    """WITH f AS (
      |  SELECT event_type AS feed, max(epoch_us(ts)) AS last_ts_us
      |  FROM events GROUP BY 1),
      |g AS (SELECT max(last_ts_us) AS global_max FROM f)
      |SELECT f.feed, f.last_ts_us,
      |       CAST(g.global_max - f.last_ts_us AS BIGINT) AS lag_us,
      |       g.global_max - f.last_ts_us > 3600000000 AS is_stale
      |FROM f CROSS JOIN g""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val f = Tables.events(s, dir)
        .groupBy($"event_type".as("feed"))
        .agg(max(unix_micros($"ts")).as("last_ts_us"))
      val g = f.agg(max($"last_ts_us").as("global_max"))
      f.crossJoin(broadcast(g))
        .select($"feed", $"last_ts_us",
          ($"global_max" - $"last_ts_us").cast("long").as("lag_us"),
          ($"global_max" - $"last_ts_us" > 3600000000L).as("is_stale"))
  }

  /** dq11: BENFORD first-digit screen — the forensic-accounting check on
    * order totals: naturally-grown monetary values follow Benford's law
    * (P(d) = log₁₀(1+1/d)); fabricated or systematically generated ones
    * don't. Per leading digit: observed count, exact-ppm share, the
    * Benford expectation, and the dq5-shaped `(p−q)² div (p+q)`
    * deviation contribution.
    *
    * log₁₀ is never COMPUTED (the dq5 libm rationale) — the nine Benford
    * ppm shares are LITERAL CONSTANTS of the check, identical in both
    * engines by construction. The leading digit comes from the cents
    * integer by decimal-string truncation (exact; cents > 0 always here
    * and each digit-9 ties to its magnitude in an all-integer pipeline).
    *
    * One scan → 9-row aggregate → literal join. Linear, map-side
    * combinable; the output is bounded by the digit alphabet.
    */
  val dq11Benford = Q("dq11_benford",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |obs AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
      |exp_ AS (
      |  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
      |    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
      |    (9, 45757)) AS v(digit, benford_ppm)),
      |sh AS (
      |  SELECT e.digit, coalesce(o.n, 0) AS n, e.benford_ppm,
      |         CAST(coalesce(o.n, 0) * 1000000 // (SELECT t FROM tot) AS BIGINT) AS obs_ppm
      |  FROM exp_ e LEFT JOIN obs o ON e.digit = o.digit)
      |SELECT CAST(digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
      |       obs_ppm, CAST(benford_ppm AS BIGINT) AS benford_ppm,
      |       CAST(CASE WHEN obs_ppm + benford_ppm = 0 THEN 0
      |                 ELSE (obs_ppm - benford_ppm) * (obs_ppm - benford_ppm)
      |                      // (obs_ppm + benford_ppm) END AS BIGINT) AS dev_contrib
      |FROM sh""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val d = Tables.orders(s, dir).select(
        expr("CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
      val obs = d.groupBy($"digit").agg(count(lit(1)).as("n"))
      val tot = obs.agg(sum($"n").cast("long").as("t"))
      // log10(1+1/d) floored to ppm — constants of the check, never computed
      val benford = Seq((1L, 301030L), (2L, 176091L), (3L, 124939L),
        (4L, 96910L), (5L, 79181L), (6L, 66947L), (7L, 57992L),
        (8L, 51153L), (9L, 45757L)).toDF("digit", "benford_ppm")
      benford.join(obs, Seq("digit"), "left").crossJoin(broadcast(tot))
        .select($"digit", coalesce($"n", lit(0L)).as("n"), $"benford_ppm",
          expr("CAST(coalesce(n, 0L) * 1000000 div t AS BIGINT)").as("obs_ppm"))
        .select($"digit", $"n", $"obs_ppm", $"benford_ppm",
          when($"obs_ppm" + $"benford_ppm" === 0, 0L).otherwise(
            expr("CAST((obs_ppm - benford_ppm) * (obs_ppm - benford_ppm) div (obs_ppm + benford_ppm) AS BIGINT)"))
            .as("dev_contrib"))
  }

  /** DQ12: FUNCTIONAL-DEPENDENCY audit — for declared candidate FDs
    * A → B, measure how far the data is from satisfying them: keys with
    * more than one distinct dependent value are violations. Schema
    * designers use this to validate normalization assumptions before
    * they become silent fanout bugs (j1b's hazard class: a "dimension"
    * key that does NOT determine its attributes explodes any join that
    * assumed it did).
    *
    * The audited set spans one FD that genuinely HOLDS (o_orderkey →
    * o_custkey, a primary-key FD — the control row proving the audit
    * can return zero) and three that plausibly-but-falsely hold
    * (l_partkey → l_suppkey, o_custkey → o_orderpriority, c_nationkey →
    * c_mktsegment).
    *
    * Scale shape: each FD is ONE map-side-combinable aggregate
    * (groupBy determinant, count_distinct dependent) plus a tiny rollup;
    * the four audits union to a 4-row result. countDistinct per key is
    * exact (the violation verdict must not be approximate); at 100 TB
    * the same audit runs per partition-of-determinant with no change.
    */
  val dq12FdAudit = Q("dq12_fd_audit",
    """WITH fd1 AS (
      |  SELECT 'orders: o_orderkey -> o_custkey' AS fd, o_orderkey AS k,
      |         count(DISTINCT o_custkey) AS nd
      |  FROM orders GROUP BY 2),
      |fd2 AS (
      |  SELECT 'lineitem: l_partkey -> l_suppkey' AS fd, l_partkey AS k,
      |         count(DISTINCT l_suppkey) AS nd
      |  FROM lineitem GROUP BY 2),
      |fd3 AS (
      |  SELECT 'orders: o_custkey -> o_orderpriority' AS fd, o_custkey AS k,
      |         count(DISTINCT o_orderpriority) AS nd
      |  FROM orders GROUP BY 2),
      |fd4 AS (
      |  SELECT 'customer: c_nationkey -> c_mktsegment' AS fd, c_nationkey AS k,
      |         count(DISTINCT c_mktsegment) AS nd
      |  FROM customer GROUP BY 2),
      |uni AS (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
      |        UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4)
      |SELECT fd, CAST(count(*) AS BIGINT) AS n_keys,
      |       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating,
      |       CAST(max(nd) AS BIGINT) AS max_distinct,
      |       CAST(1000000 * CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) // count(*) AS BIGINT) AS violation_ppm
      |FROM uni GROUP BY 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      def audit(df: DataFrame, label: String, k: String, dep: String): DataFrame =
        df.groupBy(col(k).cast("long").as("k"))
          .agg(countDistinct(col(dep)).as("nd"))
          .select(lit(label).as("fd"), $"k", $"nd")
      val uni = audit(Tables.orders(s, dir), "orders: o_orderkey -> o_custkey",
          "o_orderkey", "o_custkey")
        .unionByName(audit(Tables.lineitem(s, dir), "lineitem: l_partkey -> l_suppkey",
          "l_partkey", "l_suppkey"))
        .unionByName(audit(Tables.orders(s, dir), "orders: o_custkey -> o_orderpriority",
          "o_custkey", "o_orderpriority"))
        .unionByName(audit(Tables.customer(s, dir), "customer: c_nationkey -> c_mktsegment",
          "c_nationkey", "c_mktsegment"))
      uni.groupBy($"fd").agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum(when($"nd" > 1, 1L).otherwise(0L)).cast("long").as("n_violating"),
        max($"nd").cast("long").as("max_distinct"))
        .withColumn("violation_ppm",
          expr("1000000 * n_violating div n_keys").cast("long"))
  }

  val queries: Seq[Q] = Seq(
    q2MinSupplier, q6ForecastRevenue, q8MarketShare, q9Profit, q10Returned, q11ImportantParts,
    q13CustDist, q15TopSupplier, q16SupplierCnt, q17SmallQuantity,
    q20ExcessSuppliers, q21SoleReturner, q22GlobalBalance, dq3KpiAnomaly, dq4Orphans,
    dq5DistributionDrift, dq6KAnonymity, dq7LDiversity, dq8TCloseness,
    dq9ColumnProfile, a29Anova, p13AccumulatingSnapshot, dq10Freshness,
    dq11Benford, dq12FdAudit)
}
