package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.7 — the scalar-function surface: when/otherwise chains (F1),
  * case-insensitive rlike (F2), isin buckets (F3), deterministic
  * pseudo-random assignment replacing `rand()` (F4), date/time functions
  * (F10/F11/F13), and the dim_date build the reference declares but stubs
  * (hardcoded single row, `silver_to_gold.py:634-641`).
  *
  * All pure narrow projections — zero shuffle, fully inside whole-stage
  * codegen.
  */
object Scalars {

  /** F1+F2+F3: the reference's buyer→country→region classifier
    * (`silver_to_gold.py:285-353`): a case-insensitive regex chain over a
    * name column feeding an isin-bucketed region rollup.
    */
  val f1Classifier = Q("f1_regex_country_region",
    """SELECT s_suppkey, s_name,
      |       CASE WHEN regexp_matches(s_name, '(?i)supplier#.*[0-2]$') THEN 'United States'
      |            WHEN regexp_matches(s_name, '(?i)supplier#.*[3-5]$') THEN 'United Kingdom'
      |            ELSE 'Singapore' END AS country,
      |       CASE WHEN (CASE WHEN regexp_matches(s_name, '(?i)supplier#.*[0-2]$') THEN 'United States'
      |                       WHEN regexp_matches(s_name, '(?i)supplier#.*[3-5]$') THEN 'United Kingdom'
      |                       ELSE 'Singapore' END) IN ('United States', 'United Kingdom') THEN 'Western'
      |            ELSE 'APAC' END AS region
      |FROM supplier""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val country =
        when($"s_name".rlike("(?i)Supplier#.*[0-2]$"), "United States")
          .when($"s_name".rlike("(?i)Supplier#.*[3-5]$"), "United Kingdom")
          .otherwise("Singapore")
      Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_name", country.as("country"),
          when(country.isin("United States", "United Kingdom"), "Western")
            .otherwise("APAC").as("region"))
  }

  /** F4: deterministic pseudo-random assignment. The reference draws an
    * independent `rand()` per `when` branch (probabilities compound, and
    * re-evaluation between count and write flips rows —
    * `silver_to_gold.py:304-329,251`). The engine default replaces it with
    * a key-derived uniform so the same row always lands in the same bucket
    * — reproducing the reference's compounding semantics: branch i fires
    * with p_i on the residual population.
    */
  val f4DetRand = Q("f4_deterministic_assign",
    """SELECT o_orderkey,
      |       CASE WHEN ((o_orderkey + 0) * 48271 % 1000) < 350 THEN 'United States'
      |            WHEN ((o_orderkey + 1) * 48271 % 1000) < 250 THEN 'United Kingdom'
      |            WHEN ((o_orderkey + 2) * 48271 % 1000) < 500 THEN 'France'
      |            ELSE 'Italy' END AS country
      |FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      // Lehmer multiplier per draw (small enough to never overflow Long —
      // overflow semantics differ across engines); one independent draw per
      // branch exactly like the reference's per-when rand()
      def draw(shift: Int) =
        pmod(($"o_orderkey" + lit(shift)) * lit(48271L), lit(1000L))
      Tables.orders(s, dir)
        .select($"o_orderkey",
          when(draw(0) < 350, "United States")
            .when(draw(1) < 250, "United Kingdom")
            .when(draw(2) < 500, "France")
            .otherwise("Italy").as("country"))
  }

  /** F10/F11: the date-function surface over real timestamps — date_key
    * stamping (`silver_to_gold.py:272`), calendar parts, weekend flag.
    * Spark `dayofweek` is 1=Sunday; DuckDB `dayofweek` is 0=Sunday.
    */
  val f10Dates = Q("f10_date_functions",
    """SELECT o_orderkey,
      |       strftime(o_orderdate, '%Y%m%d') AS date_key,
      |       CAST(year(o_orderdate) AS INTEGER) AS year,
      |       CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
      |       CAST(month(o_orderdate) AS INTEGER) AS month,
      |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS day_of_week,
      |       dayname(o_orderdate) AS day_name,
      |       CAST(dayofweek(o_orderdate) IN (0, 6) AS BOOLEAN) AS is_weekend
      |FROM orders""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .select($"o_orderkey",
          date_format($"o_orderdate", "yyyyMMdd").as("date_key"),
          year($"o_orderdate").as("year"),
          quarter($"o_orderdate").as("quarter"),
          month($"o_orderdate").as("month"),
          dayofweek($"o_orderdate").as("day_of_week"),
          date_format($"o_orderdate", "EEEE").as("day_name"),
          dayofweek($"o_orderdate").isin(1, 7).as("is_weekend"))
  }

  /** F11 done properly: the dim_date the reference declares DDL for but
    * hardcodes to one stale row (`silver_to_gold.py:634-641`): a generated
    * calendar spanning the order-date domain via `sequence` + `explode` —
    * no driver-side loop, scales to any span.
    */
  val dimDate = Q("dim_date",
    """WITH span AS (
      |  SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi FROM orders
      |), days AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM span
      |)
      |SELECT strftime(d, '%Y%m%d') AS date_key, d AS date,
      |       CAST(year(d) AS INTEGER) AS year,
      |       CAST(quarter(d) AS INTEGER) AS quarter,
      |       CAST(month(d) AS INTEGER) AS month,
      |       dayname(d) AS day_name,
      |       CAST(dayofweek(d) IN (0, 6) AS BOOLEAN) AS is_weekend
      |FROM days""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .agg(to_date(min($"o_orderdate")).as("lo"), to_date(max($"o_orderdate")).as("hi"))
        .select(explode(sequence($"lo", $"hi")).as("date"))
        .select(
          date_format($"date", "yyyyMMdd").as("date_key"),
          $"date",
          year($"date").as("year"),
          quarter($"date").as("quarter"),
          month($"date").as("month"),
          date_format($"date", "EEEE").as("day_name"),
          dayofweek($"date").isin(1, 7).as("is_weekend"))
  }

  /** F15: the string-function pack — the cross-engine-safe subset in one
    * query (trim/pad/case/slice/replace/reverse/split_part/repeat/ascii),
    * exercised over customer names. Deliberately excludes functions with
    * divergent edge semantics between engines (initcap word boundaries,
    * locale-sensitive collation); narrow projection, codegen'd.
    */
  val stringPack = Q("f15_string_pack",
    """SELECT c_custkey,
      |       upper(c_name) AS up, lower(c_mktsegment) AS lo,
      |       trim('  ' || c_name || ' ') AS trimmed,
      |       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
      |       substr(c_name, 1, 8) AS prefix,
      |       replace(c_name, '#', '-') AS replaced,
      |       reverse(c_mktsegment) AS rev,
      |       split_part(c_name, '#', 1) AS first_part,
      |       repeat('*', CAST(c_custkey % 5 AS INTEGER)) AS stars,
      |       ascii(c_mktsegment) AS first_ascii,
      |       CAST(length(c_name) AS BIGINT) AS name_len
      |FROM customer""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.customer(s, dir).select(
        $"c_custkey",
        upper($"c_name").as("up"), lower($"c_mktsegment").as("lo"),
        trim(concat(lit("  "), $"c_name", lit(" "))).as("trimmed"),
        lpad($"c_custkey".cast("string"), 12, "0").as("padded"),
        substring($"c_name", 1, 8).as("prefix"),
        regexp_replace($"c_name", "#", "-").as("replaced"),
        reverse($"c_mktsegment").as("rev"),
        split_part($"c_name", lit("#"), lit(1)).as("first_part"),
        repeat(lit("*"), pmod($"c_custkey", lit(5)).cast("int")).as("stars"),
        ascii($"c_mktsegment").as("first_ascii"),
        length($"c_name").cast("long").as("name_len"))
  }

  /** F16: ordered string aggregation — ANSI LISTAGG … WITHIN GROUP
    * (Spark 4's `listagg`; DuckDB's `string_agg` with ORDER BY). The
    * ORDER BY inside the aggregate is what makes the result deterministic
    * and cross-engine comparable — an unordered listagg is
    * accumulation-order-dependent and would never hash-match. Broadcast
    * dim join + one hash aggregate; the per-group payload (nation names)
    * is bounded, so the aggregate state stays small at any corpus size.
    */
  val listAgg = Q("f16_listagg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
          count(lit(1)).as("n_nations"))
  }

  /** F17: HIGHER-ORDER array functions — transform / filter / aggregate
    * (fold) / zip_with / sort over the per-document word array, the
    * lambda-function surface a modern engine carries for nested data.
    * Every lambda here runs inside whole-stage codegen (no UDFs), so at
    * 100 TB the per-row array work costs the same as built-in scalar
    * functions. All outputs integer/string (the fold is an integer sum —
    * accumulation order can't matter), so the row set hash-matches
    * DuckDB's list_* equivalents exactly.
    */
  val higherOrder = Q("f17_higher_order",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |SELECT doc_id,
      |       CAST(len(ws) AS INT) AS n_words,
      |       CAST(len(list_filter(ws, x -> len(x) > 4)) AS INT) AS n_long,
      |       CAST(list_reduce(list_prepend(0, list_transform(ws, x -> len(x))),
      |                        (acc, x) -> acc + x) AS INT) AS total_chars,
      |       array_to_string(list_transform(list_zip(
      |           ws[1:2], generate_series(1, least(2, len(ws)))),
      |         p -> CAST(p[2] AS VARCHAR) || ':' || p[1]), ',') AS tagged_head,
      |       array_to_string(list_sort(list_distinct(ws))[1:3], ',') AS sorted_head
      |FROM w""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ws = split($"text", " ")
      Tables.documents(s, dir)
        .select($"doc_id", ws.as("ws"))
        .select(
          $"doc_id",
          size($"ws").as("n_words"),
          size(filter($"ws", x => length(x) > 4)).as("n_long"),
          aggregate($"ws", lit(0), (acc, x) => acc + length(x)).as("total_chars"),
          array_join(zip_with(
            slice($"ws", 1, 2),
            sequence(lit(1), least(lit(2), size($"ws"))),
            (w, i) => concat(i.cast("string"), lit(":"), w)), ",").as("tagged_head"),
          array_join(slice(array_sort(array_distinct($"ws")), 1, 3), ",")
            .as("sorted_head"))
  }

  val queries: Seq[Q] = Seq(f1Classifier, f4DetRand, f10Dates, dimDate, stringPack,
    listAgg, higherOrder)
}
