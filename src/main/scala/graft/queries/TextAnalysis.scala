package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * fingerprinting (BASELINE.json north star).
  *
  * All are narrow per-row projections over split/regexp/higher-order
  * array functions — zero shuffle, whole-stage codegen'd, and at 100 TB
  * they run at scan speed. No UDFs anywhere: `split`/`filter`/`size`/
  * `regexp_count`/`md5` compose the same semantics the classic Python
  * text-pipeline UDFs would, at codegen speed.
  */
object TextAnalysis {

  private def words: Column = split(col("text"), " ")

  /** Whitespace tokens + a BPE-ish regex token count (letters runs,
    * single digits, punctuation marks each count as one token — the
    * pre-tokenizer shape GPT-style BPE vocabularies assume).
    */
  val tokenCount = Q("t1_token_count",
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
      |       CAST(length(text) AS BIGINT) AS n_chars_measured
      |FROM documents""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir).select(
        $"doc_id",
        size(words).cast("long").as("ws_tokens"),
        regexp_count($"text", lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")).cast("long").as("bpe_ish_tokens"),
        length($"text").cast("long").as("n_chars_measured"))
  }

  private val stopwords = Seq("a", "the", "of", "to", "and", "in")

  /** Quality scoring: length, mean token length, stopword ratio,
    * distinct-token ratio (repetitiveness) — the standard cheap filters a
    * pretraining pipeline applies before expensive dedup.
    */
  val qualityScore = Q("t2_quality_score",
    s"""SELECT doc_id,
       |       len(string_split(text, ' ')) AS n_tokens,
       |       CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_token_len,
       |       CAST(len([w for w in string_split(text, ' ') if w IN ('a','the','of','to','and','in')]) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS stopword_ratio,
       |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |         / len(string_split(text, ' ')) AS distinct_ratio
       |FROM documents""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val n = size(words).cast("double")
      Tables.documents(s, dir).select(
        $"doc_id",
        size(words).as("n_tokens"),
        (length(regexp_replace($"text", " ", "")).cast("double") / n).as("mean_token_len"),
        (size(filter(words, w => w.isin(stopwords: _*))).cast("double") / n).as("stopword_ratio"),
        (size(array_distinct(words)).cast("double") / n).as("distinct_ratio"))
  }

  /** n-gram-heuristic language ID: score each candidate language by its
    * marker-token hit rate, pick the argmax (deterministic tiebreak by
    * score then language code). The marker lists are tiny lexicons — the
    * classic fastText-free fallback.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "fast", "slow"),
    "de" -> Seq("der", "die", "und", "schnell"),
    "es" -> Seq("el", "la", "de", "rapido"),
    "fr" -> Seq("le", "la", "et", "vite"),
    "zh" -> Seq("的", "表", "快"))

  val langId = Q("t3_lang_id", {
    val scores = langMarkers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(len([w for w in string_split(text, ' ') if w IN ($list)]) AS DOUBLE) / len(string_split(text, ' '))"
    }
    val structs = langMarkers.zip(scores).map { case ((lang, _), sc) =>
      s"{'score': $sc, 'lang': '$lang'}"
    }.mkString(", ")
    s"""SELECT doc_id, lang AS labeled_lang,
       |       list_max([$structs]).lang AS predicted_lang,
       |       list_max([$structs]).score AS lang_score
       |FROM documents""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      val n = size(words).cast("double")
      val scored = langMarkers.map { case (lang, ms) =>
        struct(
          (size(filter(words, w => w.isin(ms: _*))).cast("double") / n).as("score"),
          lit(lang).as("lang"))
      }
      // array_max over (score, lang) structs = argmax with lexicographic
      // tiebreak on the language code — same rule DuckDB's list_max applies
      Tables.documents(s, dir).select(
        $"doc_id", $"lang".as("labeled_lang"),
        array_max(array(scored: _*)).getField("lang").as("predicted_lang"),
        array_max(array(scored: _*)).getField("score").as("lang_score"))
  }

  /** Document fingerprinting: content hash of the normalized text plus an
    * order-insensitive bag-of-words hash (catches shuffled near-copies) —
    * the keys an exact-dedup pass groups on.
    */
  val fingerprint = Q("t4_fingerprint",
    """SELECT doc_id,
      |       md5(lower(text)) AS content_hash,
      |       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS bag_hash
      |FROM documents""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir).select(
        $"doc_id",
        md5(lower($"text")).as("content_hash"),
        md5(array_join(array_sort(array_distinct(split(lower($"text"), " "))), " ")).as("bag_hash"))
  }

  /** Corpus n-gram frequency table (top-25 bigrams) — the building block
    * for contamination checks and n-gram LM scoring over a training
    * corpus. One explode + one hash aggregate + top-k.
    */
  val ngramStats = Q("t5_ngram_stats",
    """SELECT bigram, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
      |FROM (
      |  SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
      |                         for i in generate_series(1, greatest(len(w) - 1, 0))]) AS bigram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      |GROUP BY bigram
      |ORDER BY freq DESC, bigram LIMIT 25""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Ngrams.postings(graft.Tables.documents(s, dir), n = 2, distinct = false, spread = false,
        outCol = "bigram")
        .groupBy($"bigram")
        .agg(count(lit(1)).as("freq"), countDistinct($"doc_id").as("doc_freq"))
        .orderBy(desc("freq"), $"bigram")
        .limit(25)
  }

  /** Sketch pack — the approximate aggregates the exact KPIs switch to at
    * 100 TB (HLL distinct, t-digest-ish percentiles). Sketch ENCODINGS
    * are engine-specific, so the raw approximations can never hash-match
    * DuckDB — instead the query emits the exact companions (distinct
    * count, discrete percentiles — both fully oracled) plus the sketch
    * CONTRACT as booleans: each approximation sits within its documented
    * error bound of the exact value. The oracle asserts the booleans
    * literally TRUE, so a Spark-side sketch drifting out of bound is a
    * red hash row, not a silent miss; the tighter numeric accuracy
    * assertions stay in LlmOpsSpec. Bounds: HLL rsd 0.02 → 3σ = 6%;
    * percentile_approx(accuracy 1000) → rank error 0.1% ⇒ the approx
    * value must lie between the exact neighbors ±1% rank.
    */
  val sketchStats = Q("a7_sketch_stats",
    """SELECT l_returnflag,
      |       count(DISTINCT l_orderkey) AS exact_orders,
      |       percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50_price,
      |       percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price,
      |       TRUE AS hll_within_6pct,
      |       TRUE AS p50_within_1pct_rank,
      |       TRUE AS p99_within_1pct_rank
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val agg = graft.Tables.lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("exact_orders"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_price"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99_price"),
          approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("ap50"),
          percentile_approx($"l_extendedprice", lit(0.99), lit(1000)).as("ap99"),
          expr("percentile_disc(0.49) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_lo"),
          expr("percentile_disc(0.51) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_hi"),
          expr("percentile_disc(0.98) WITHIN GROUP (ORDER BY l_extendedprice)").as("p99_lo"),
          max($"l_extendedprice").as("p99_hi"))
      agg.select(
        $"l_returnflag", $"exact_orders", $"p50_price", $"p99_price",
        (abs($"approx_orders" - $"exact_orders") <= $"exact_orders" * 0.06)
          .as("hll_within_6pct"),
        ($"ap50" >= $"p50_lo" && $"ap50" <= $"p50_hi").as("p50_within_1pct_rank"),
        ($"ap99" >= $"p99_lo" && $"ap99" <= $"p99_hi").as("p99_within_1pct_rank"))
  }

  /** T26: language-ID CONFUSION MATRIX — t3's prediction aggregated
    * against the labeled language: per (labeled, predicted) cell count +
    * the labeled language's share that lands in that cell. The standard
    * classifier-eval artifact, here over the whole corpus in one
    * aggregate after the stateless scoring projection (at 100 TB: one
    * scan + one #langs²-cell hash aggregate — nothing else).
    */
  val langConfusion = Q("t26_lang_confusion", {
    val scores = langMarkers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(len([w for w in string_split(text, ' ') if w IN ($list)]) AS DOUBLE) / len(string_split(text, ' '))"
    }
    val structs = langMarkers.zip(scores).map { case ((lang, _), sc) =>
      s"{'score': $sc, 'lang': '$lang'}"
    }.mkString(", ")
    s"""WITH p AS (SELECT lang AS labeled_lang,
       |                  list_max([$structs]).lang AS predicted_lang
       |           FROM documents),
       |tot AS (SELECT labeled_lang, count(*) AS n_labeled FROM p GROUP BY 1)
       |SELECT p.labeled_lang, p.predicted_lang,
       |       count(*) AS n_docs,
       |       CAST(count(*) AS DOUBLE) / t.n_labeled AS row_share
       |FROM p JOIN tot t USING (labeled_lang)
       |GROUP BY p.labeled_lang, p.predicted_lang, t.n_labeled""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      val n = size(words).cast("double")
      val scored = langMarkers.map { case (lang, ms) =>
        struct(
          (size(filter(words, w => w.isin(ms: _*))).cast("double") / n).as("score"),
          lit(lang).as("lang"))
      }
      val p = Tables.documents(s, dir).select(
        $"lang".as("labeled_lang"),
        array_max(array(scored: _*)).getField("lang").as("predicted_lang"))
      val tot = p.groupBy($"labeled_lang").agg(count(lit(1)).as("n_labeled"))
      p.join(broadcast(tot), "labeled_lang")
        .groupBy($"labeled_lang", $"predicted_lang", $"n_labeled")
        .agg(count(lit(1)).as("n_docs"))
        .select($"labeled_lang", $"predicted_lang", $"n_docs",
          ($"n_docs".cast("double") / $"n_labeled").as("row_share"))
  }

  /** T28: N-GRAM NOVELTY scoring — per document, the fraction of its
    * distinct 8-grams FIRST INTRODUCED by it (no lower-doc_id document
    * contains them). The streaming-curation "contribution" score: a doc
    * whose content is entirely old n-grams adds nothing to a corpus that
    * already has the earlier docs, even when no single pair clears a
    * near-dup threshold (d2/d3's pairwise view cannot see diffuse
    * N-way redundancy; novelty can). doc_id order stands in for
    * ingestion order.
    *
    * Scale: postings explode ONCE (linear in corpus tokens), the
    * first-owner min as a gram-partitioned WINDOW over that single
    * explode, one per-doc aggregate — no pairwise anything, and no
    * owner-join that would re-derive the explode on both shuffle sides
    * (the r11 fix: the join shape evaluated the gram build twice, the
    * same double-eval class as e32's caps subtree). The gram-keyed
    * shuffle is uniform under the same hash reasoning as d6.
    */
  val ngramNovelty = Q("t28_ngram_novelty",
    """WITH g AS (
      |  SELECT doc_id, g FROM (
      |    SELECT doc_id, unnest(list_distinct(
      |             [array_to_string(w[i:i+7], ' ')
      |              for i in generate_series(1, greatest(len(w) - 7, 0))])) AS g
      |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
      |own AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1)
      |SELECT g.doc_id, count(*) AS n_grams,
      |       CAST(sum(CASE WHEN own.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |       CAST(sum(CASE WHEN own.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*) AS novelty
      |FROM g JOIN own ON g.g = own.g
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val g = Ngrams.postings(graft.Tables.documents(s, dir), n = 8,
      distinct = true, outCol = "g")
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    g.withColumn("first_doc", min($"doc_id").over(byGram))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when($"first_doc" === $"doc_id", 1).otherwise(0)).as("n_novel"))
      .select($"doc_id", $"n_grams", $"n_novel",
        ($"n_novel".cast("double") / $"n_grams").as("novelty"))
  }

  /** T29: CORPUS-RELATIVE LEXICAL RARITY — per doc, the fraction of its
    * distinct tokens that are rare in the whole corpus (document
    * frequency ≤ 2). Complements t2 (intra-doc stats: a doc can be
    * internally diverse yet made of boilerplate vocabulary) and t28
    * (8-gram novelty: phrase-level, first-occurrence): this is the
    * token-level global signal quality filters use to separate
    * generic/templated text (rare_ratio → 0) from specific content.
    * Shape at 100 TB: one distinct-token explode, one df aggregate, one
    * postings join back — the d2/t28 postings family, linear in corpus
    * tokens; all integers until one IEEE division.
    */
  val rareTokenRatio = Q("t29_rare_token_ratio",
    """WITH toks AS (
      |  SELECT doc_id, tok
      |  FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
      |       unnest(ws) AS t(tok)),
      |dfreq AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1)
      |SELECT doc_id,
      |       count(*) AS n_distinct_tokens,
      |       CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |       CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
      |         AS rare_ratio
      |FROM toks JOIN dfreq USING (tok)
      |GROUP BY doc_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select($"doc_id", explode(array_distinct(split($"text", " "))).as("tok"))
      // document frequency as a token-partitioned window over the SINGLE
      // explode — the agg-then-join-back shape evaluated the explode on
      // both shuffle sides (the t28/e32 double-eval class, fixed r11)
      val byTok = org.apache.spark.sql.expressions.Window.partitionBy($"tok")
      toks.withColumn("df", count(lit(1)).over(byTok))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_distinct_tokens"),
          sum(when($"df" <= 2, 1L).otherwise(0L)).as("n_rare"))
        .select($"doc_id", $"n_distinct_tokens", $"n_rare",
          ($"n_rare".cast("double") / $"n_distinct_tokens").as("rare_ratio"))
  }

  /** T31: per-doc KEY-PHRASE EXTRACTION — each document's top-3
    * distinctive BIGRAMS by TF-IDF (t10's linear idf = N/df,
    * IEEE-identical across engines), with ubiquitous phrases (df > N/2)
    * excluded — the cheap stopword cut that needs no language list.
    * Bigrams, not unigrams, because a unigram vocabulary saturates (on
    * this corpus 30 of 31 words appear in most docs — zero signal) while
    * the phrase space stays combinatorially sparse at any corpus size.
    *
    * The per-group top-k runs through the NATIVE TopKPerGroup SparkPlan
    * (w11's operator): bounded heaps per partition, ≤ g·k·p rows into the
    * exchange — at 100 TB the postings never fully sort. Ties pin on
    * (score DESC, phrase ASC) in both engines.
    */
  val keywordExtract = Q("t31_keyword_extract",
    """WITH b AS (
      |  SELECT doc_id,
      |         unnest([array_to_string(w[i:i+1], ' ')
      |                 for i in generate_series(1, greatest(len(w) - 1, 0))]) AS phrase
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |tf AS (SELECT doc_id, phrase, count(*) AS tf FROM b GROUP BY 1, 2),
      |dft AS (SELECT phrase, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.phrase, tf.tf,
      |         CAST(tf.tf AS DOUBLE) * ((SELECT n FROM n) / CAST(dft.df AS DOUBLE)) AS score
      |  FROM tf JOIN dft ON tf.phrase = dft.phrase
      |  WHERE CAST(2 * dft.df AS DOUBLE) <= (SELECT n FROM n)),
      |r AS (SELECT doc_id, phrase, tf, score,
      |             row_number() OVER (PARTITION BY doc_id
      |                                ORDER BY score DESC, phrase) AS rn
      |      FROM scored)
      |SELECT doc_id, CAST(rn AS BIGINT) AS kw_rank, phrase AS keyphrase,
      |       CAST(tf AS BIGINT) AS tf, score
      |FROM r WHERE rn <= 3""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = graft.Tables.documents(s, dir)
    val tf = Ngrams.postings(docs, n = 2, distinct = false, outCol = "phrase", spread = false)
      .groupBy($"doc_id", $"phrase").agg(count(lit(1)).as("tf"))
    // document frequency as a phrase-partitioned window over the SINGLE
    // tf relation: the dft-join-back shape re-derived the explode + tf
    // aggregate on both shuffle sides (the t28/e32 double-eval class —
    // ReusedExchange can't help because the two subtrees differ, one
    // being the aggregate of the other)
    val byPhrase = org.apache.spark.sql.expressions.Window.partitionBy($"phrase")
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.withColumn("df", count(lit(1)).over(byPhrase))
      .join(broadcast(n))
      .filter(($"df" * 2).cast("double") <= $"n")
      .select($"doc_id", $"phrase", $"tf",
        ($"tf".cast("double") * ($"n" / $"df".cast("double"))).as("score"))
    val top = graft.plans.TopKPerGroup.topK(scored, Seq("doc_id"),
      Seq(("score", false), ("phrase", true)), 3)
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"score".desc, $"phrase")
    top.withColumn("kw_rank", row_number().over(rankW).cast("long"))
      .select($"doc_id", $"kw_rank", $"phrase".as("keyphrase"),
        $"tf".cast("long").as("tf"), $"score")
  }

  /** t35: COLLOCATION mining by integer lift — the corpus-level "which
    * word pairs co-occur far more than chance" extraction (phrase/term
    * discovery for tokenizer vocab curation and boilerplate detection).
    * Classic PMI needs `log`, which is not correctly rounded in either
    * engine's libm — so the score is the LIFT ratio itself,
    * observed/(expected under independence), in exact quantized integer
    * arithmetic: unigram and bigram probabilities floor to ppm shares
    * (the dq5 discipline), lift = obs_ppm·10⁸ div (p_a_ppm·p_b_ppm) in
    * centi-units. Order-independent at any parallelism; pairs whose
    * unigram share floors to 0 ppm sit below the quantization floor and
    * are excluded (documented, support-filtered pairs are ≥ 5 occurrences
    * anyway).
    *
    * Shape: adjacent-bigram explode (zip_with over one split — scan
    * speed, no shuffle), one hash aggregate per table (unigrams,
    * bigrams), two equi-joins of the support-filtered bigram table to the
    * unigram table (vocabulary ≪ corpus; AQE broadcasts when small), and
    * two 1-row totals broadcast back. Linear end to end; the min-support
    * filter bounds the output, never the aggregation.
    *
    * Overflow discipline: obs_ppm ≤ 10⁶ so obs_ppm·10⁸ ≤ 10¹⁴ and
    * p_a·p_b ≤ 10¹² — all int64-safe at any corpus size because the
    * shares are quantized BEFORE multiplying.
    */
  val collocationLift = Q("t35_collocation_lift",
    """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |bi AS (
      |  SELECT unnest(ws[1:len(ws)-1]) AS w_a, unnest(ws[2:len(ws)]) AS w_b
      |  FROM w WHERE len(ws) >= 2),
      |un AS (
      |  SELECT w, count(*) AS n_w
      |  FROM (SELECT unnest(ws) AS w FROM w) GROUP BY 1),
      |ut AS (SELECT CAST(sum(n_w) AS BIGINT) AS tu FROM un),
      |bc AS (SELECT w_a, w_b, count(*) AS n_ab FROM bi GROUP BY 1, 2),
      |bt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS tb FROM bc),
      |p AS (
      |  SELECT b.w_a, b.w_b, b.n_ab,
      |         CAST(b.n_ab * 1000000 // (SELECT tb FROM bt) AS BIGINT) AS obs_ppm,
      |         CAST(ua.n_w * 1000000 // (SELECT tu FROM ut) AS BIGINT) AS p_a_ppm,
      |         CAST(ub.n_w * 1000000 // (SELECT tu FROM ut) AS BIGINT) AS p_b_ppm
      |  FROM bc b JOIN un ua ON b.w_a = ua.w JOIN un ub ON b.w_b = ub.w
      |  WHERE b.n_ab >= 5)
      |SELECT w_a, w_b, CAST(n_ab AS BIGINT) AS n_ab, obs_ppm, p_a_ppm, p_b_ppm,
      |       CAST(obs_ppm * 100000000 // (p_a_ppm * p_b_ppm) AS BIGINT) AS lift_centi
      |FROM p WHERE p_a_ppm > 0 AND p_b_ppm > 0""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Tables.documents(s, dir).select(split($"text", " ").as("ws"))
      val bi = w.filter(size($"ws") >= 2)
        .select(explode(zip_with(
          slice($"ws", lit(1), size($"ws") - 1),
          slice($"ws", lit(2), size($"ws") - 1),
          (a, b) => struct(a.as("w_a"), b.as("w_b")))).as("p"))
        .select($"p.w_a", $"p.w_b")
      val un = w.select(explode($"ws").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("n_w"))
      val ut = un.agg(sum($"n_w").cast("long").as("tu"))
      val bc = bi.groupBy($"w_a", $"w_b").agg(count(lit(1)).as("n_ab"))
      val bt = bc.agg(sum($"n_ab").cast("long").as("tb"))
      bc.filter($"n_ab" >= 5)
        .join(un.select($"w".as("w_a"), $"n_w".as("na")), Seq("w_a"))
        .join(un.select($"w".as("w_b"), $"n_w".as("nb")), Seq("w_b"))
        .join(broadcast(ut)).join(broadcast(bt))
        .select($"w_a", $"w_b", $"n_ab",
          expr("CAST(n_ab * 1000000 div tb AS BIGINT)").as("obs_ppm"),
          expr("CAST(na * 1000000 div tu AS BIGINT)").as("p_a_ppm"),
          expr("CAST(nb * 1000000 div tu AS BIGINT)").as("p_b_ppm"))
        .filter($"p_a_ppm" > 0 && $"p_b_ppm" > 0)
        .select($"w_a", $"w_b", $"n_ab", $"obs_ppm", $"p_a_ppm", $"p_b_ppm",
          expr("CAST(obs_ppm * 100000000 div (p_a_ppm * p_b_ppm) AS BIGINT)")
            .as("lift_centi"))
  }

  /** t36: TOKEN BURSTINESS — per-token variance-to-mean ratio (VMR) of
    * per-document counts: ≈1 means Poisson-scattered (function words),
    * ≫1 means bursty (topical terms that pile up in few docs — the
    * content-word detector that needs no stopword list, and a boilerplate
    * alarm when a "rare" token's VMR explodes). Docs NOT containing the
    * token count as zeros WITHOUT materializing them: with N total docs,
    * mean = Σc/N and var = Σc²/N − mean², so
    * VMR·10⁶ = (N·Σc² − (Σc)²)·10⁶ div (N·Σc) — all exact integers, one
    * broadcast N.
    *
    * Shape: per-(doc, token) counts (hash agg over the explode), one
    * per-token rollup (vocabulary-bounded output), a df ≥ 5 support
    * filter bounding the emission. Linear, map-side combinable.
    */
  val tokenBurstiness = Q("t36_token_burstiness",
    """WITH tc AS (
      |  SELECT doc_id, w, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |st AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS df,
      |         CAST(sum(c) AS BIGINT) AS s1,
      |         CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM tc GROUP BY 1)
      |SELECT w AS token, df, s1 AS total_occurrences,
      |       CAST((CAST(nn.n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) * 1000000
      |            // (CAST(nn.n AS HUGEINT) * s1) AS BIGINT) AS vmr_ppm
      |FROM st CROSS JOIN nn WHERE df >= 5""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val tc = Tables.documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      val nn = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      val st = tc.groupBy($"w").agg(
        count(lit(1)).as("df"),
        sum($"c").cast("long").as("s1"),
        sum($"c" * $"c").cast("long").as("s2"))
      // numerator ≥ 0 by Cauchy–Schwarz, so `div` ≡ `//`; widths run in
      // DECIMAL (Spark) / HUGEINT (oracle — DuckDB's DECIMAL `//` rounds,
      // the e29 gotcha) because n·Σc² outgrows int64 at corpus scale
      st.filter($"df" >= 5).crossJoin(broadcast(nn))
        .select($"w".as("token"), $"df", $"s1".as("total_occurrences"),
          expr("""CAST((CAST(n AS DECIMAL(19,0)) * s2 - CAST(s1 AS DECIMAL(19,0)) * s1) * 1000000
                  div (CAST(n AS DECIMAL(19,0)) * s1) AS BIGINT)""")
            .as("vmr_ppm"))
  }

  /** T37: HEAPS-LAW vocabulary-growth curve — distinct-token count after
    * the first 10% / 25% / 50% / 100% of the corpus (by doc order): the
    * diagnostic that tells you whether the token universe GROWS with the
    * corpus or SATURATES. This is the load-bearing dial for every
    * shingle-keyed operator in the engine (d17's prefix-filter join is
    * output-bound on a saturated universe and subquadratic on a growing
    * one — SCALE.md's decade rehearsal), so the curve is a first-class
    * corpus audit, not a curiosity. All-integer output — no log fits, so
    * no cross-engine float risk.
    *
    * Scale shape: ONE token explode + a min-first-seen aggregate
    * (map-side combinable), then a 4-row cutoff table theta-joined in
    * (broadcast, first_seen ≤ cutoff) and re-aggregated; per-doc token
    * counts ride the same pattern. Nothing rescans text per cutoff.
    */
  val heapsLaw = Q("t37_heaps_law",
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |         row_number() OVER (ORDER BY doc_id) AS rnk
      |  FROM documents),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
      |cut AS (
      |  SELECT pct, CAST(ceil(n_docs * pct / 100.0) AS BIGINT) AS cutoff
      |  FROM n, (VALUES (10), (25), (50), (100)) AS p(pct)),
      |tok AS (SELECT rnk, unnest(w) AS token FROM d),
      |seen AS (SELECT token, min(rnk) AS first_seen,
      |                count(*) AS occs FROM tok GROUP BY 1),
      |dt AS (SELECT rnk, len(w) AS n_tok FROM d)
      |SELECT CAST(c.pct AS BIGINT) AS pct, c.cutoff AS n_docs,
      |       CAST((SELECT count(*) FROM seen s WHERE s.first_seen <= c.cutoff) AS BIGINT) AS vocab,
      |       CAST((SELECT coalesce(sum(n_tok), 0) FROM dt WHERE dt.rnk <= c.cutoff) AS BIGINT) AS total_tokens
      |FROM cut c""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy($"doc_id")))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val cut = n.crossJoin(Seq(10, 25, 50, 100).toDF("pct"))
        .select($"pct".cast("long").as("pct"),
          ceil($"n_docs" * $"pct" / 100.0).cast("long").as("cutoff"))
      val seen = d.select($"rnk", explode($"w").as("token"))
        .groupBy($"token").agg(min($"rnk").as("first_seen"))
      val vocabAt = seen.join(broadcast(cut), $"first_seen" <= $"cutoff")
        .groupBy($"pct", $"cutoff").agg(count(lit(1)).as("vocab"))
      val tokensAt = d.select($"rnk", size($"w").as("n_tok"))
        .join(broadcast(cut), $"rnk" <= $"cutoff")
        .groupBy($"pct".as("pct2"), $"cutoff".as("cutoff2"))
        .agg(coalesce(sum($"n_tok"), lit(0L)).as("total_tokens"))
      vocabAt.join(tokensAt,
          $"pct" === $"pct2" && $"cutoff" === $"cutoff2")
        .select($"pct", $"cutoff".as("n_docs"),
          $"vocab".cast("long").as("vocab"),
          $"total_tokens".cast("long").as("total_tokens"))
  }

  val queries: Seq[Q] = Seq(tokenCount, qualityScore, langId, fingerprint,
    ngramStats, sketchStats, langConfusion, ngramNovelty, rareTokenRatio,
    keywordExtract, collocationLift, tokenBurstiness, heapsLaw)
}
