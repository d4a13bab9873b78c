package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Model training as a DISTRIBUTED AGGREGATION — closed-form linear
  * regression by normal equations, the "train a cheap quality model over
  * the whole corpus" step of a training-data pipeline (the reference has
  * no ML surface; this is the completions family's answer to "score docs
  * with a learned model, not a hand-tuned heuristic").
  *
  * Why this shape at 100 TB: the entire fit is ONE map-side-combinable
  * aggregation pass producing the 10 sufficient statistics of X'X / X'y
  * (d = 2 features + intercept). No iteration, no driver-side data, no
  * gradient schedule — the shuffle moves 10 numbers per partition, and
  * the solve is O(d³) column arithmetic on a 1-row DataFrame. This is the
  * same sufficient-statistics discipline as a16's exact correlation,
  * extended from moments to a solved model.
  *
  * Exactness: every sufficient statistic is an exact integer (token
  * counts × char counts), accumulated in narrow decimals and widened with
  * the a16 casting rules (≥ one DECIMAL(19)+ operand per product to force
  * DuckDB's int128 path; triple products cap at DECIMAL(38,0) in both
  * engines — fine at these magnitudes). The 3×3 solve is Cramer's rule in
  * pure integer-decimal cofactor arithmetic, so the coefficient
  * numerators (det Mᵢ) and the determinant are EXACT integers; the only
  * floating-point ops are the final casts and divisions — correctly
  * rounded IEEE on identical operands in both engines, hence hash-exact.
  *
  * Features (shared with t1's public tokenizer-shape definitions):
  * x1 = whitespace tokens, x2 = DISTINCT whitespace tokens (t2’s
  * repetitiveness signal — the BPE-ish count is exactly collinear with x1
  * on this corpus); target y = n_chars.
  * MlSpec pins the Cramer identity M·w_num = b·det exactly in BigInt.
  */
object Ml {

  /** Per-doc integer features, identical to t1's definitions. */
  private[graft] def features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      size(split($"text", " ")).cast("long").as("x1"),
      size(array_distinct(split($"text", " "))).cast("long").as("x2"),
      $"n_chars".as("y"))
  }

  /** The 10 sufficient statistics as one exact-decimal row. */
  private[graft] def stats(f: DataFrame): DataFrame =
    f.agg(
      count(lit(1)).cast(DecimalType(10, 0)).as("n"),
      sum(col("x1")).cast(DecimalType(12, 0)).as("sx1"),
      sum(col("x2")).cast(DecimalType(12, 0)).as("sx2"),
      sum(col("x1") * col("x1")).cast(DecimalType(14, 0)).as("sx11"),
      sum(col("x1") * col("x2")).cast(DecimalType(14, 0)).as("sx12"),
      sum(col("x2") * col("x2")).cast(DecimalType(14, 0)).as("sx22"),
      sum(col("y")).cast(DecimalType(13, 0)).as("sy"),
      sum(col("x1") * col("y")).cast(DecimalType(15, 0)).as("sx1y"),
      sum(col("x2") * col("y")).cast(DecimalType(15, 0)).as("sx2y"),
      sum(col("y") * col("y")).cast(DecimalType(18, 0)).as("syy"))

  /** 2×2 minor with the int128-forcing width discipline: the FIRST operand
    * of every product is widened to DECIMAL(19,0) so neither engine
    * evaluates an int64×int64 product that could overflow at runtime
    * (a16's `sy*sy` lesson).
    */
  private def minor2(a: Column, b: Column, c: Column, d: Column): Column =
    a.cast(DecimalType(19, 0)) * d - b.cast(DecimalType(19, 0)) * c

  /** Cofactor expansion of the three Cramer determinants + det(M), as
    * exact decimal columns over the stats row. `lam` is the ridge term
    * added to every diagonal entry of M (0 for OLS).
    */
  private[graft] def cramer(st: DataFrame, lam: Long): DataFrame = {
    val l = lit(lam).cast(DecimalType(10, 0))
    val m11 = col("n") + l
    val m22 = col("sx11") + l
    val m33 = col("sx22") + l
    val m12 = col("sx1"); val m13 = col("sx2"); val m23 = col("sx12")
    val b1 = col("sy"); val b2 = col("sx1y"); val b3 = col("sx2y")
    def w19(c: Column) = c.cast(DecimalType(19, 0))
    // shared 2×2 minor (rows 2/3, cols 2/3 of M)
    val a23 = minor2(m22, m23, m23, m33)   // m22·m33 − m23²
    val det = w19(m11) * a23 -
      w19(m12) * minor2(m12, m13, m23, m33) +
      w19(m13) * minor2(m12, m13, m22, m23)
    val det0 = w19(b1) * a23 -
      w19(m12) * minor2(b2, b3, m23, m33) +
      w19(m13) * minor2(b2, b3, m22, m23)
    val det1 = w19(m11) * minor2(b2, b3, m23, m33) -
      w19(b1) * minor2(m12, m13, m23, m33) +
      w19(m13) * minor2(m12, m13, b2, b3)
    val det2 = w19(m11) * minor2(m22, m23, b2, b3) -
      w19(m12) * minor2(m12, m13, b2, b3) +
      w19(b1) * minor2(m12, m13, m22, m23)
    st.select(col("*"), det.as("det"),
      det0.as("det0"), det1.as("det1"), det2.as("det2"))
  }

  /** The shared DuckDB replay of [[features]]+[[stats]]+[[cramer]] —
    * splice into each oracle. Width casts mirror the Spark side exactly.
    */
  private[queries] def oracleCramer(lam: Long): String =
    s"""f AS (
       |  SELECT doc_id,
       |         len(string_split(text, ' ')) AS x1,
       |         len(list_distinct(string_split(text, ' '))) AS x2,
       |         n_chars AS y
       |  FROM documents),
       |st AS (
       |  SELECT CAST(count(*) AS DECIMAL(10,0)) + $lam AS m11,
       |         CAST(sum(x1) AS DECIMAL(12,0)) AS m12,
       |         CAST(sum(x2) AS DECIMAL(12,0)) AS m13,
       |         CAST(sum(x1 * x1) AS DECIMAL(14,0)) + $lam AS m22,
       |         CAST(sum(x1 * x2) AS DECIMAL(14,0)) AS m23,
       |         CAST(sum(x2 * x2) AS DECIMAL(14,0)) + $lam AS m33,
       |         CAST(sum(y) AS DECIMAL(13,0)) AS b1,
       |         CAST(sum(x1 * y) AS DECIMAL(15,0)) AS b2,
       |         CAST(sum(x2 * y) AS DECIMAL(15,0)) AS b3,
       |         CAST(sum(y * y) AS DECIMAL(18,0)) AS syy,
       |         CAST(count(*) AS DECIMAL(10,0)) AS n
       |  FROM f),
       |cr AS (
       |  SELECT *,
       |    CAST(m11 AS DECIMAL(19,0)) * (CAST(m22 AS DECIMAL(19,0)) * m33 - CAST(m23 AS DECIMAL(19,0)) * m23)
       |    - CAST(m12 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * m33 - CAST(m13 AS DECIMAL(19,0)) * m23)
       |    + CAST(m13 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * m23 - CAST(m13 AS DECIMAL(19,0)) * m22) AS det,
       |    CAST(b1 AS DECIMAL(19,0)) * (CAST(m22 AS DECIMAL(19,0)) * m33 - CAST(m23 AS DECIMAL(19,0)) * m23)
       |    - CAST(m12 AS DECIMAL(19,0)) * (CAST(b2 AS DECIMAL(19,0)) * m33 - CAST(b3 AS DECIMAL(19,0)) * m23)
       |    + CAST(m13 AS DECIMAL(19,0)) * (CAST(b2 AS DECIMAL(19,0)) * m23 - CAST(b3 AS DECIMAL(19,0)) * m22) AS det0,
       |    CAST(m11 AS DECIMAL(19,0)) * (CAST(b2 AS DECIMAL(19,0)) * m33 - CAST(b3 AS DECIMAL(19,0)) * m23)
       |    - CAST(b1 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * m33 - CAST(m13 AS DECIMAL(19,0)) * m23)
       |    + CAST(m13 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * b3 - CAST(m13 AS DECIMAL(19,0)) * b2) AS det1,
       |    CAST(m11 AS DECIMAL(19,0)) * (CAST(m22 AS DECIMAL(19,0)) * b3 - CAST(m23 AS DECIMAL(19,0)) * b2)
       |    - CAST(m12 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * b3 - CAST(m13 AS DECIMAL(19,0)) * b2)
       |    + CAST(b1 AS DECIMAL(19,0)) * (CAST(m12 AS DECIMAL(19,0)) * m23 - CAST(m13 AS DECIMAL(19,0)) * m22) AS det2
       |  FROM st)""".stripMargin

  /** ml1: OLS quality regressor (n_chars ~ intercept + ws_tokens +
    * distinct_tokens), one aggregation pass + exact Cramer solve. Also emits
    * the exact-sufficient-statistics R²: SSE = (det·Σy² − Σ detᵢ·bᵢ)/det,
    * all integer until the final double divisions.
    */
  val ml1NormalEq = Q("ml1_normal_eq",
    s"""WITH ${oracleCramer(0)}
       |SELECT CAST(n AS BIGINT) AS n_docs,
       |       CAST(det AS DOUBLE) AS det,
       |       CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS w_intercept,
       |       CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS w_ws_tokens,
       |       CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS w_distinct_tokens,
       |       CAST(1 AS DOUBLE)
       |         - (CAST(det AS DOUBLE) * CAST(syy AS DOUBLE)
       |            - (CAST(det0 AS DOUBLE) * CAST(b1 AS DOUBLE)
       |               + CAST(det1 AS DOUBLE) * CAST(b2 AS DOUBLE)
       |               + CAST(det2 AS DOUBLE) * CAST(b3 AS DOUBLE)))
       |           / CAST(det AS DOUBLE)
       |           / (CAST(syy AS DOUBLE) - CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE) / CAST(n AS DOUBLE))
       |         AS r2
       |FROM cr""".stripMargin) { (s, dir) =>
    val cr = cramer(stats(features(s, dir)), 0L)
    val detD = col("det").cast("double")
    val sseD = (detD * col("syy").cast("double")
      - (col("det0").cast("double") * col("sy").cast("double")
        + col("det1").cast("double") * col("sx1y").cast("double")
        + col("det2").cast("double") * col("sx2y").cast("double"))) / detD
    val sstD = col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") / col("n").cast("double")
    cr.select(
      col("n").cast("long").as("n_docs"),
      detD.as("det"),
      (col("det0").cast("double") / detD).as("w_intercept"),
      (col("det1").cast("double") / detD).as("w_ws_tokens"),
      (col("det2").cast("double") / detD).as("w_distinct_tokens"),
      (lit(1.0) - sseD / sstD).as("r2"))
  }

  /** Fixed-point weight scale for ml2's exact training error. */
  private[graft] val Q20 = 1048576L

  /** ml2: RIDGE fit (λ added to every diagonal entry — including the
    * intercept's, a documented simplification that keeps the solve one
    * Cramer call) + EXACT training SSE of the λ=256 model evaluated with
    * Q20-quantized integer weights: wq = floor(detᵢ·2²⁰/det) computed in
    * double on identical exact operands (deterministic IEEE), residuals
    * r = 2²⁰·y − (wq₀ + wq₁x₁ + wq₂x₂) in pure int64, Σr² in int128
    * decimal. Second linear pass over the docs — still zero iteration.
    */
  val ml2Ridge = Q("ml2_ridge",
    s"""WITH ${oracleCramer(256)},
       |w AS (
       |  SELECT n,
       |    CAST(floor(CAST(det0 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq0,
       |    CAST(floor(CAST(det1 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq1,
       |    CAST(floor(CAST(det2 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq2
       |  FROM cr),
       |res AS (
       |  SELECT w.n, w.wq0, w.wq1, w.wq2,
       |         1048576 * f.y - (w.wq0 + w.wq1 * f.x1 + w.wq2 * f.x2) AS r
       |  FROM f CROSS JOIN w)
       |SELECT CAST(any_value(n) AS BIGINT) AS n_docs,
       |       any_value(wq0) AS wq_intercept,
       |       any_value(wq1) AS wq_ws_tokens,
       |       any_value(wq2) AS wq_distinct_tokens,
       |       CAST(CAST(sum(CAST(r AS DECIMAL(19,0)) * r) AS DOUBLE)
       |            / (1048576.0 * 1048576.0) / count(*) AS DOUBLE) AS mse_chars2
       |FROM res""".stripMargin) { (s, dir) =>
    val f = features(s, dir)
    val cr = cramer(stats(f), 256L)
    val detD = col("det").cast("double")
    val w = cr.select(
      col("n").cast("long").as("n_docs"),
      floor(col("det0").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq0"),
      floor(col("det1").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq1"),
      floor(col("det2").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq2"))
    val r = lit(Q20) * col("y") - (col("wq0") + col("wq1") * col("x1") + col("wq2") * col("x2"))
    f.join(broadcast(w))  // 1-row weights broadcast to every doc
      .select(col("n_docs"), col("wq0"), col("wq1"), col("wq2"), r.as("r"))
      .groupBy(col("n_docs"), col("wq0"), col("wq1"), col("wq2"))
      .agg((sum(col("r").cast(DecimalType(19, 0)) * col("r")).cast("double")
        / lit(Q20.toDouble * Q20.toDouble) / count(lit(1)).cast("double")).as("mse_chars2"))
      .select(col("n_docs"),
        col("wq0").as("wq_intercept"), col("wq1").as("wq_ws_tokens"),
        col("wq2").as("wq_distinct_tokens"), col("mse_chars2"))
  }

  /** ml3: GROUPED trend regression — an independent simple OLS
    * (daily revenue ~ day) PER GROUP in one aggregation pass: the
    * "fit a trend line per segment" query every forecasting dashboard
    * runs, and the grouped generalization of ml1's global fit.
    *
    * Shape: daily rollup (one shuffle) → per-group 2×2 sufficient
    * statistics (second shuffle on the 5-row group key, map-side
    * combined) → closed-form slope/intercept per group. No iteration;
    * at 100 TB the work is the daily rollup's scan, and the statistics
    * row per group is 5 numbers regardless of history length.
    *
    * Exactness: x is the epoch day minus a constant origin (keeps the
    * integer magnitudes small), all five statistics are exact decimals
    * with the a16/ml1 widening discipline (every product carries a
    * DECIMAL(19) operand — int128 in DuckDB), and slope/intercept are
    * IEEE divisions of identical exact operands on both engines.
    */
  val ml3GroupTrend = Q("ml3_group_trend",
    """WITH daily AS (
      |  SELECT o_orderpriority AS priority,
      |         epoch_us(o_orderdate) // 86400000000 - 8000 AS x,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |st AS (
      |  SELECT priority,
      |         CAST(count(*) AS DECIMAL(10,0)) AS n,
      |         CAST(sum(x) AS DECIMAL(12,0)) AS sx,
      |         CAST(sum(y) AS DECIMAL(16,0)) AS sy,
      |         CAST(sum(x * x) AS DECIMAL(14,0)) AS sxx,
      |         CAST(sum(x * y) AS DECIMAL(19,0)) AS sxy
      |  FROM daily GROUP BY 1),
      |cr AS (
      |  SELECT priority, n, sx, sy,
      |         CAST(n AS DECIMAL(19,0)) * sxy - CAST(sx AS DECIMAL(19,0)) * sy AS num,
      |         CAST(n AS DECIMAL(19,0)) * sxx - CAST(sx AS DECIMAL(19,0)) * sx AS den
      |  FROM st)
      |SELECT priority, CAST(n AS BIGINT) AS n_days,
      |       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope_cents_per_day,
      |       (CAST(sy AS DOUBLE) - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
      |         / CAST(n AS DOUBLE) AS intercept_cents
      |FROM cr""".stripMargin) { (s, dir) =>
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderpriority".as("priority"),
        (expr("unix_micros(o_orderdate) div 86400000000") - 8000).as("x"))
      .agg(sum((Exact.dec2($"o_totalprice") * 100).cast("long")).as("y"))
    val st = daily.groupBy($"priority").agg(
      count(lit(1)).cast(DecimalType(10, 0)).as("n"),
      sum($"x").cast(DecimalType(12, 0)).as("sx"),
      sum($"y").cast(DecimalType(16, 0)).as("sy"),
      sum($"x" * $"x").cast(DecimalType(14, 0)).as("sxx"),
      sum($"x" * $"y").cast(DecimalType(19, 0)).as("sxy"))
    def w19(c: Column) = c.cast(DecimalType(19, 0))
    val cr = st.select($"priority", $"n", $"sx", $"sy",
      (w19($"n") * $"sxy" - w19($"sx") * $"sy").as("num"),
      (w19($"n") * $"sxx" - w19($"sx") * $"sx").as("den"))
    val slope = $"num".cast("double") / $"den".cast("double")
    cr.select($"priority", $"n".cast("long").as("n_days"),
      slope.as("slope_cents_per_day"),
      (($"sy".cast("double") - slope * $"sx".cast("double")) / $"n".cast("double"))
        .as("intercept_cents"))
  }

  /** t33: MODEL-BASED quality filter — the train→apply loop closed: the
    * ml2 ridge model's Q20-quantized integer weights score every doc,
    * and documents whose length the model can't explain (|residual|
    * above the exact P90) are flagged — the "learned quality screen"
    * step of a curation pipeline, replacing hand-tuned heuristics with
    * a model trained ON the corpus in the same job.
    *
    * Everything downstream of the (already exact-portable) training is
    * integer: residuals in int64 at Q20 scale, the threshold an actual
    * member via `percentile_disc` broadcast back. Two linear passes —
    * one to train (shared with ml2 via the same sufficient statistics),
    * one to score; no iteration, no driver data.
    */
  val modelQualityFilter = Q("t33_model_quality_filter",
    s"""WITH ${oracleCramer(256)},
       |w AS (
       |  SELECT
       |    CAST(floor(CAST(det0 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq0,
       |    CAST(floor(CAST(det1 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq1,
       |    CAST(floor(CAST(det2 AS DOUBLE) * 1048576.0 / CAST(det AS DOUBLE)) AS BIGINT) AS wq2
       |  FROM cr),
       |absr AS (
       |  SELECT f.doc_id,
       |         abs(1048576 * f.y - (w.wq0 + w.wq1 * f.x1 + w.wq2 * f.x2)) AS ar
       |  FROM f CROSS JOIN w),
       |th AS (SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY ar) AS t FROM absr)
       |SELECT doc_id, CAST(ar AS BIGINT) AS abs_residual_q20,
       |       ar > (SELECT t FROM th) AS is_outlier
       |FROM absr""".stripMargin) { (s, dir) =>
    val f = features(s, dir)
    val cr = cramer(stats(f), 256L)
    val detD = col("det").cast("double")
    val w = cr.select(
      floor(col("det0").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq0"),
      floor(col("det1").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq1"),
      floor(col("det2").cast("double") * lit(Q20.toDouble) / detD).cast("long").as("wq2"))
    val absr = f.join(broadcast(w)) // 1-row weights broadcast (t10 pattern)
      .select(col("doc_id"),
        abs(lit(Q20) * col("y") - (col("wq0") + col("wq1") * col("x1")
          + col("wq2") * col("x2"))).as("ar"))
    val th = absr.agg(
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY ar)").as("t"))
    absr.join(broadcast(th))
      .select(col("doc_id"), col("ar").cast("long").as("abs_residual_q20"),
        (col("ar") > col("t")).as("is_outlier"))
  }

  val queries: Seq[Q] = Seq(ml1NormalEq, ml2Ridge, ml3GroupTrend, modelQualityFilter)
}
