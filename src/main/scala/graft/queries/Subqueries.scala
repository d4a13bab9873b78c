package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** Subquery + set-operation completions: correlated scalar subqueries
  * (Catalyst decorrelates them into joins — no per-row re-execution) and
  * INTERSECT/EXCEPT (the reference uses only UNION ALL, §2.6).
  */
object Subqueries {

  /** Correlated scalar subqueries: orders above their customer's average.
    * Expressed as SQL on the Spark side too so Catalyst's decorrelation
    * does the rewrite (→ aggregate + join, visible in the plan — a naive
    * engine would re-run the inner query per row).
    *
    * The average compare is cross-multiplied (`price × n > Σ prices`) so
    * everything stays exact decimal — DuckDB's `avg(DECIMAL)` returns
    * DOUBLE (accumulation-order dependent), which would reintroduce the
    * cross-engine boundary hazard `Exact` exists to avoid.
    */
  val corrSubquery = Q("q_corr_subquery",
    """SELECT o_orderkey, o_custkey,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
      |      (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
      |      (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
      |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)""".stripMargin) {
    (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM orders_v o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) >
              (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
               FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)""")
  }

  /** INTERSECT: users that are both event-active and customers with
    * orders (set semantics, dedup built in).
    */
  val intersectQ = Q("u2_intersect",
    """SELECT user_id AS id FROM events
      |INTERSECT
      |SELECT o_custkey AS id FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).select($"user_id".as("id"))
        .intersect(Tables.orders(s, dir).select($"o_custkey".as("id")))
  }

  /** EXCEPT: customers with orders but no tracked events. */
  val exceptQ = Q("u3_except",
    """SELECT o_custkey AS id FROM orders
      |EXCEPT
      |SELECT user_id AS id FROM events""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir).select($"o_custkey".as("id"))
        .except(Tables.events(s, dir).select($"user_id".as("id")))
  }

  /** UNION (distinct): the dedup-built-in set union — all ids known to
    * either side, each once. Completes the set-op family next to the KPI's
    * UNION ALL (U1), INTERSECT (u2) and EXCEPT (u3): one hash-distinct
    * over the concatenation.
    */
  val unionDistinctQ = Q("u4_union_distinct",
    """SELECT user_id AS id FROM events
      |UNION
      |SELECT o_custkey AS id FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).select($"user_id".as("id"))
        .union(Tables.orders(s, dir).select($"o_custkey".as("id")))
        .distinct()
  }

  /** EXCEPT ALL: MULTISET difference — each occurrence counts, so a user
    * with 5 purchase events and 2 orders keeps 3 rows (u3's set EXCEPT
    * would drop them entirely the moment one order exists). Spark plans
    * this as a count-bag anti-subtract (generate/replicate), not a
    * distinct — the multiset semantics survive at any scale because the
    * per-key counts partial-aggregate map-side first.
    */
  val exceptAllQ = Q("u5_except_all",
    """SELECT user_id AS id FROM events WHERE event_type = 'purchase'
      |EXCEPT ALL
      |SELECT o_custkey AS id FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).filter($"event_type" === "purchase")
        .select($"user_id".as("id"))
        .exceptAll(Tables.orders(s, dir).select($"o_custkey".as("id")))
  }

  /** INTERSECT ALL: multiset intersection — min(multiplicity) copies per
    * key survive.
    */
  val intersectAllQ = Q("u6_intersect_all",
    """SELECT user_id AS id FROM events WHERE event_type = 'purchase'
      |INTERSECT ALL
      |SELECT o_custkey AS id FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).filter($"event_type" === "purchase")
        .select($"user_id".as("id"))
        .intersectAll(Tables.orders(s, dir).select($"o_custkey".as("id")))
  }

  val queries: Seq[Q] = Seq(corrSubquery, intersectQ, exceptQ, unionDistinctQ,
    exceptAllQ, intersectAllQ)
}
