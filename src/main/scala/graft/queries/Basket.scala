package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MARKET-BASKET analysis — pairwise association rules (support /
  * confidence / lift) over order baskets, the classic cross-sell query a
  * commerce warehouse answers from the same lineitem fact the reference's
  * marts aggregate (provenance: the reference's order-item rollup grain,
  * `silver_to_gold.py:504-509`, whose marts only ever roll up —
  * co-occurrence is the completion).
  *
  * Shape and scale:
  *  - baskets = DISTINCT (order, part): one hash aggregate.
  *  - A-PRIORI PRUNE: items in < minSupport baskets cannot appear in any
  *    pair with pair count ≥ minSupport, so they are dropped BEFORE pair
  *    generation (the downward-closure step that makes candidate
  *    generation tractable — at 100 TB the long tail of once-bought parts
  *    is the bulk of the catalog and never reaches the self-join).
  *  - pair generation = self-equi-join on the basket key with `pa < pb`:
  *    fanout is Σ k_i² bounded by the max basket size (13 here, small in
  *    any real order fact), never |parts|².
  *  - per-item counts ride INTO the join (carried columns, folded with
  *    max() in the pair aggregate) so no second join back to item stats.
  *  - all metrics are integer ppm (floor of an IEEE-exact int64-over-
  *    int64 division — both engines round-correctly, so hashes match).
  *    lift's numerator pair_n·n_baskets·10⁶ fits int64 through ~sf100;
  *    beyond that promote to decimal(38,0).
  */
object Basket {

  val mb1MarketBasket = Q("mb1_market_basket",
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |tot AS (SELECT count(DISTINCT o) AS n_baskets FROM b),
      |item AS (SELECT p, count(*) AS n_item FROM b GROUP BY 1),
      |freq AS (SELECT * FROM item WHERE n_item >= 2),
      |fb AS (SELECT b.o, b.p, f.n_item FROM b JOIN freq f ON b.p = f.p),
      |pairs AS (
      |  SELECT a.p AS part_a, c.p AS part_b, count(*) AS pair_n,
      |         max(a.n_item) AS n_a, max(c.n_item) AS n_b
      |  FROM fb a JOIN fb c ON a.o = c.o AND a.p < c.p
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, CAST(pair_n AS BIGINT) AS pair_n,
      |       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |       CAST(floor(pair_n * 1000000 / (SELECT n_baskets FROM tot)) AS BIGINT) AS support_ppm,
      |       CAST(floor(pair_n * 1000000 / n_a) AS BIGINT) AS conf_ab_ppm,
      |       CAST(floor(pair_n * 1000000 / n_b) AS BIGINT) AS conf_ba_ppm,
      |       CAST(floor(pair_n * (SELECT n_baskets FROM tot) * 1000000 / (n_a * n_b)) AS BIGINT) AS lift_ppm
      |FROM pairs WHERE pair_n >= 2""".stripMargin) { (s, dir) =>
    sharedPairRules(s, dir)
  }

  /** The mb1 rule table, session-memoized: mb2 consumes the SAME pair
    * mill (its union reads it twice more), so the co-occurrence list is a
    * shared derived table exactly like the d3 pair list — before the memo
    * the mb2 plan re-derived the whole mill per union branch (r13 plan
    * audit: 18 Exchanges, 10 lineitem scans across mb1+mb2; guide §2.4).
    * The basket table is cached for the build's own four consumers
    * (n_baskets, item counts, both self-join sides) — one lineitem scan
    * and one distinct instead of four.
    */
  private[graft] def sharedPairRules(s: SparkSession, dir: String): DataFrame =
    Memo.cached(s, dir, "mb_pair_rules") {
      // the basket table is memoized (not bare-.cache()d) so Memo's
      // fingerprint-turnover eviction unpersists it alongside the rules
      // when the data dir is rewritten — a bare cache inside the build
      // block stayed pinned for the session lifetime (r14 ADVICE)
      pairRules(Memo.cached(s, dir, "mb_baskets") { baskets(s, dir) },
        minSupport = 2)
    }

  /** DISTINCT (order, part) baskets from the lineitem fact. */
  private[graft] def baskets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
  }

  /** The rule mill over any `(o, p)` basket table — factored out so
    * BasketSpec can drive the A-priori losslessness pin (pruned ≡
    * unpruned output) directly.
    */
  private[graft] def pairRules(b: DataFrame, minSupport: Int): DataFrame = {
    val nBaskets = b.agg(countDistinct(col("o")).as("n_baskets"))
    val itemN = b.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
    // A-priori downward closure: pair support ≥ s ⇒ both item supports ≥ s
    val frequent = itemN.filter(col("n_item") >= minSupport)
    val fb = b.join(frequent, "p")
    val fa = fb.select(col("o"), col("p").as("part_a"), col("n_item").as("na"))
    val fc = fb.select(col("o"), col("p").as("part_b"), col("n_item").as("nb"))
    val pairs = fa.join(fc, fa("o") === fc("o") && col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("pair_n"), max(col("na")).as("n_a"), max(col("nb")).as("n_b"))
      .filter(col("pair_n") >= minSupport)
    pairs.join(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("pair_n"), col("n_a"), col("n_b"),
        floor(col("pair_n") * 1000000L / col("n_baskets")).cast("long").as("support_ppm"),
        floor(col("pair_n") * 1000000L / col("n_a")).cast("long").as("conf_ab_ppm"),
        floor(col("pair_n") * 1000000L / col("n_b")).cast("long").as("conf_ba_ppm"),
        floor(col("pair_n") * col("n_baskets") * 1000000L / (col("n_a") * col("n_b")))
          .cast("long").as("lift_ppm"))
  }

  /** MB2: ITEM-ITEM recommendations — the collaborative-filtering face of
    * mb1: each part's top-3 most-similar parts by co-occurrence COSINE
    * cos(a,b) = pair_n / √(n_a·n_b) — the symmetric, popularity-
    * normalized metric recommenders rank by (confidence is directional
    * and lift over-rewards rare pairs).
    *
    * Exactness: pair_n and the item counts are exact ints; n_a·n_b < 2⁵³
    * so the product, the correctly-rounded sqrt, and the division form a
    * fixed IEEE chain — bit-identical across engines (the a27 idiom).
    * Ranking ties break on rec_part.
    *
    * Shape: the pair mill is mb1's (A-priori-pruned basket self-join,
    * fanout bounded by basket size); the pair list is UNIONED in both
    * directions and ranked per part through the NATIVE [[TopKPerGroup]]
    * plan — one partial/final TopK pass, no full sort per group.
    */
  val mb2ItemRecs = Q("mb2_item_recommendation",
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |item AS (SELECT p, count(*) AS n_item FROM b GROUP BY 1),
      |freq AS (SELECT * FROM item WHERE n_item >= 2),
      |fb AS (SELECT b.o, b.p, f.n_item FROM b JOIN freq f ON b.p = f.p),
      |pairs AS (
      |  SELECT a.p AS part_a, c.p AS part_b, count(*) AS pair_n,
      |         max(a.n_item) AS n_a, max(c.n_item) AS n_b
      |  FROM fb a JOIN fb c ON a.o = c.o AND a.p < c.p
      |  GROUP BY 1, 2),
      |sym AS (
      |  SELECT part_a AS part, part_b AS rec_part, pair_n, n_a, n_b FROM pairs WHERE pair_n >= 2
      |  UNION ALL
      |  SELECT part_b AS part, part_a AS rec_part, pair_n, n_b AS n_a, n_a AS n_b
      |  FROM pairs WHERE pair_n >= 2),
      |scored AS (
      |  SELECT part, rec_part, CAST(pair_n AS BIGINT) AS pair_n,
      |         CAST(pair_n AS DOUBLE) / sqrt(CAST(n_a * n_b AS DOUBLE)) AS cosine
      |  FROM sym),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY part
      |                               ORDER BY cosine DESC, rec_part) AS rank
      |  FROM scored)
      |SELECT part, rec_part, pair_n, cosine, CAST(rank AS BIGINT) AS rank
      |FROM ranked WHERE rank <= 3""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pairs = sharedPairRules(s, dir)
      .select($"part_a", $"part_b", $"pair_n", $"n_a", $"n_b")
    val sym = pairs
      .select($"part_a".as("part"), $"part_b".as("rec_part"), $"pair_n", $"n_a", $"n_b")
      .unionByName(pairs.select($"part_b".as("part"), $"part_a".as("rec_part"),
        $"pair_n", $"n_b".as("n_a"), $"n_a".as("n_b")))
    val scored = sym.select($"part", $"rec_part", $"pair_n",
      ($"pair_n".cast("double") / sqrt(($"n_a" * $"n_b").cast("double"))).as("cosine"))
    val top = graft.plans.TopKPerGroup.topK(scored, Seq("part"),
      Seq(("cosine", false), ("rec_part", true)), k = 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"part").orderBy($"cosine".desc, $"rec_part")
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  val queries: Seq[Q] = Seq(mb1MarketBasket, mb2ItemRecs)
}
