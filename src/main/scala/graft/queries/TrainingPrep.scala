package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-corpus preparation operators beyond filtering/dedup: the
  * Gopher-style repetition signal, context-window sequence packing,
  * deterministic stratified sampling, and exact TF-IDF keyword retrieval.
  *
  * Cross-engine float discipline (same as Exact.scala): every double is
  * produced by a FIXED expression tree — single divisions, products, and
  * literal left-to-right sums — never a SUM aggregate over doubles, so
  * Spark and DuckDB fold identically and the driver's hash compare is
  * bit-exact.
  *
  * Scale notes (100 TB): all four are one explode + hash-aggregate /
  * window per partition key (doc_id or source) — no self-joins, no
  * driver-side state; the TF-IDF document-frequency side is a 1-row
  * broadcast.
  */
object TrainingPrep {

  /** T7: repetition quality (the Gopher "fraction of characters in the
    * most common n-gram" rule): per doc, the top bigram (ties broken
    * lexicographically) and the fraction of characters it covers.
    * High values flag boilerplate/spam docs a pretraining pipeline drops.
    */
  val gopherQuality = Q("t7_gopher_quality",
    """WITH bg AS (
      |  SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
      |                         for i in generate_series(1, greatest(len(w) - 1, 0))]) AS bigram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |bgc AS (SELECT doc_id, bigram, count(*) AS freq FROM bg GROUP BY 1, 2),
      |top AS (SELECT doc_id, bigram, freq,
      |               row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, bigram) AS rk
      |        FROM bgc)
      |SELECT t.doc_id, t.bigram AS top_bigram, t.freq AS top_bigram_freq,
      |       CAST(t.freq * length(t.bigram) AS DOUBLE) / d.n_chars AS frac_chars_top_bigram
      |FROM top t JOIN documents d ON t.doc_id = d.doc_id
      |WHERE t.rk = 1""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val bgc = Ngrams.postings(docs, n = 2, distinct = false, outCol = "bigram", spread = false)
        .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("freq"))
      // argmax via min(struct(-freq, bigram)) — max freq with lexicographic-
      // min tiebreak, matching the oracle's window — as one partial-agg
      // hash aggregate instead of a window's shuffle+sort (at 100 TB the
      // sort is the cost; the aggregate combines map-side)
      bgc.groupBy($"doc_id")
        .agg(min(struct((-$"freq").as("nf"), $"bigram")).as("m"))
        .join(docs.select($"doc_id", $"n_chars"), "doc_id")
        .select($"doc_id", $"m.bigram".as("top_bigram"), (-$"m.nf").as("top_bigram_freq"),
          ((-$"m.nf" * length($"m.bigram")).cast("double") / $"n_chars")
            .as("frac_chars_top_bigram"))
  }

  val packBudget = 512

  /** T8: context-window sequence packing — assign each doc its starting
    * training sequence under a fixed token budget, scanning docs in
    * (source, doc_id) order: seq_id = floor(preceding-tokens / budget).
    * The greedy contiguous-packing approximation (docs may straddle a
    * boundary; the trainer splits those) — what matters at scale is that
    * the assignment is one running-sum window per source partition, no
    * shuffle beyond the partition key.
    */
  val seqPacking = Q("t8_seq_packing",
    s"""WITH t AS (SELECT source, doc_id,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |           FROM documents),
       |c AS (SELECT source, doc_id, n_tokens,
       |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM t)
       |SELECT source, doc_id, n_tokens,
       |       CAST((cum - n_tokens) // $packBudget AS BIGINT) AS seq_id,
       |       CAST((cum - n_tokens) % $packBudget AS BIGINT) AS seq_offset
       |FROM c""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
        .withColumn("cum", sum($"n_tokens").over(w))
        .select($"source", $"doc_id", $"n_tokens",
          expr(s"(cum - n_tokens) div $packBudget").as("seq_id"),
          (($"cum" - $"n_tokens") % packBudget).as("seq_offset"))
  }

  /** T9: deterministic stratified sampling — keep 10% of each source
    * stratum, selected by md5(doc_id) order (a stable pseudo-random
    * permutation both engines compute identically; no rand()). The shape
    * a data-mixture pipeline uses to downsample sources to target
    * proportions, reproducibly.
    */
  val stratifiedSample = Q("t9_stratified_sample",
    """WITH r AS (SELECT source, doc_id,
      |             row_number() OVER (PARTITION BY source
      |                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |             count(*) OVER (PARTITION BY source) AS n
      |           FROM documents)
      |SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
      |FROM r WHERE rn <= CAST(ceil(CAST(n AS DOUBLE) * 0.10) AS BIGINT)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy(md5($"doc_id".cast("string")), $"doc_id")
      val cw = Window.partitionBy($"source")
      Tables.documents(s, dir)
        .select($"source", $"doc_id")
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .filter($"rn" <= ceil($"n".cast("double") * lit(0.10)).cast("long"))
        .select($"source", $"doc_id", $"rn".cast("long").as("sample_rank"))
  }

  private val terms = Seq("fast", "slow", "spark")

  /** T10: exact TF-IDF keyword retrieval (idf = N/df, no log — keeps the
    * score a fixed multiply-add chain, IEEE-identical across engines):
    * top-20 docs for a 3-term query. The document-frequency side is a
    * single broadcast row; scoring is a narrow projection — at scale this
    * runs at scan speed, and the top-k is a TakeOrdered, not a full sort.
    */
  val tfidfSearch = Q("t10_tfidf_search", {
    val tfCols = terms.map(t =>
      s"CAST(len([w for w in string_split(text, ' ') if w = '$t']) AS DOUBLE) AS tf_$t").mkString(", ")
    val dfCols = terms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(", ")
    // df=0 guard: an absent term would otherwise score 0 * (n/0) = NaN,
    // and NaN ordering/filter semantics differ cross-engine
    val score = terms.map(t =>
      s"(CASE WHEN df_$t > 0 THEN tf_$t * (n / df_$t) ELSE CAST(0 AS DOUBLE) END)")
      .mkString(" + ")
    s"""WITH tf AS (SELECT doc_id, $tfCols FROM documents),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |df AS (SELECT $dfCols FROM tf)
       |SELECT doc_id, $score AS score
       |FROM tf, stats, df
       |WHERE $score > 0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val words = split($"text", " ")
      val tf = docs.select(($"doc_id" +: terms.map(t =>
        size(filter(words, w => w === t)).cast("double").as(s"tf_$t"))): _*)
      val df = tf.agg(
        count(lit(1)).cast("double").as("n"),
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1).otherwise(0)).cast("double").as(s"df_$t")): _*)
      // fixed left-to-right sum — never a double SUM aggregate; df=0
      // guarded (mirrors the oracle CASE) so absent terms contribute 0,
      // not 0 * (n/0) = NaN
      val score = terms.map(t =>
        when(col(s"df_$t") > 0, col(s"tf_$t") * (col("n") / col(s"df_$t")))
          .otherwise(lit(0.0))).reduce(_ + _)
      tf.crossJoin(broadcast(df))
        .select($"doc_id", score.as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
  }

  /** T11: curriculum binning — decile of the repetitiveness signal
    * (distinct-token ratio, exact double) within each source stratum via
    * `ntile`. One shuffle on `source`, then a per-partition sort — the
    * partitioned form is what survives scale (a GLOBAL ntile would funnel
    * the corpus through one task; at 100 TB the cut-points would instead
    * come from `approx_percentile` and binning becomes a narrow
    * projection — that variant trades oracle-exact boundaries for scan
    * speed, so the exposed op is the per-stratum exact one).
    */
  val qualityDeciles = Q("t11_quality_deciles",
    """WITH q AS (SELECT source, doc_id,
      |             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |               / len(string_split(text, ' ')) AS distinct_ratio
      |           FROM documents)
      |SELECT source, doc_id, distinct_ratio,
      |       CAST(ntile(10) OVER (PARTITION BY source
      |                            ORDER BY distinct_ratio, doc_id) AS BIGINT) AS quality_decile
      |FROM q""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val words = split($"text", " ")
      val w = Window.partitionBy($"source").orderBy($"distinct_ratio", $"doc_id")
      Tables.documents(s, dir)
        .select($"source", $"doc_id",
          (size(array_distinct(words)).cast("double") / size(words)).as("distinct_ratio"))
        .withColumn("quality_decile", ntile(10).over(w).cast("long"))
  }

  val mixBudget = 800L

  /** T12: token-budget mixture sampling — the data-mixture primitive: from
    * each source, keep documents (in the deterministic md5 shuffle order of
    * [[stratifiedSample]]) until the source's token budget fills. One
    * running-sum window per source; integer arithmetic end-to-end. Weighted
    * mixtures = a per-source budget column instead of the constant.
    */
  val tokenBudgetMix = Q("t12_token_budget_mix",
    s"""WITH r AS (SELECT source, doc_id,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |             md5(CAST(doc_id AS VARCHAR)) AS h
       |           FROM documents),
       |c AS (SELECT source, doc_id, n_tokens,
       |        sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |      FROM r)
       |SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM c WHERE cum_tokens <= $mixBudget""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .filter($"cum_tokens" <= mixBudget)
  }

  /** T13: PII detect + redact ([[graft.operators.PiiScrub]]) — exercised
    * on deterministic PII-bearing text synthesized from the customer
    * table (the corpus itself contains none), so the regex semantics are
    * oracle-verified cross-engine: counts before scrubbing and the fully
    * redacted text must match DuckDB's RE2 evaluation of the identical
    * patterns byte-for-byte.
    */
  val piiScrub = Q("t13_pii_scrub", {
    import graft.operators.PiiScrub
    def count(re: String) = s"CAST(len(regexp_extract_all(t, '$re')) AS BIGINT)"
    val scrubbed =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |  t, '${PiiScrub.emailRe}', '[EMAIL]', 'g'),
         |     '${PiiScrub.urlRe}', '[URL]', 'g'),
         |     '${PiiScrub.cardRe}', '[CARD]', 'g'),
         |     '${PiiScrub.phoneRe}', '[PHONE]', 'g')""".stripMargin
    s"""WITH src AS (
       |  SELECT c_custkey,
       |         'contact ' || replace(c_name, ' ', '.') || '@corp.example call +1415555'
       |           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
       |           || ' card 4111 1111 1111 ' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
       |           || ' site https://ex.example/u/' || CAST(c_custkey AS VARCHAR) AS t
       |  FROM customer)
       |SELECT c_custkey,
       |       ${count(PiiScrub.emailRe)} AS n_emails,
       |       ${count(PiiScrub.urlRe)} AS n_urls,
       |       ${count(PiiScrub.cardRe)} AS n_cards,
       |       $scrubbed AS scrubbed
       |FROM src""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      import graft.operators.PiiScrub
      val t = concat(
        lit("contact "), regexp_replace($"c_name", " ", "."),
        lit("@corp.example call +1415555"),
        lpad(pmod($"c_custkey", lit(10000)).cast("string"), 4, "0"),
        lit(" card 4111 1111 1111 "),
        lpad(pmod($"c_custkey", lit(10000)).cast("string"), 4, "0"),
        lit(" site https://ex.example/u/"), $"c_custkey".cast("string"))
      Tables.customer(s, dir)
        .select($"c_custkey", t.as("t"))
        .select($"c_custkey",
          regexp_count($"t", lit(PiiScrub.emailRe)).cast("long").as("n_emails"),
          regexp_count($"t", lit(PiiScrub.urlRe)).cast("long").as("n_urls"),
          regexp_count($"t", lit(PiiScrub.cardRe)).cast("long").as("n_cards"),
          PiiScrub.scrub($"t").as("scrubbed"))
  }

  /** T14: n-gram LM scoring, the KenLM-free proxy: score each doc by the
    * mean CORPUS frequency of its bigram instances — high = built from
    * common constructions, low = rare/garbled text. The float discipline
    * makes it oracle-exact: per-doc Σ of INTEGER corpus counts (order-free
    * exact), then one double division. Plan: bigram postings join the
    * corpus frequency table on the bigram (one shuffle), per-doc hash
    * aggregate — the LM-scoring shape at any corpus size (a real LM swaps
    * the frequency table for a broadcast model shard).
    */
  val bigramLmScore = Q("t14_bigram_lm_score",
    """WITH bg AS (
      |  SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
      |                         for i in generate_series(1, greatest(len(w) - 1, 0))]) AS bigram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |cf AS (SELECT bigram, count(*) AS cfreq FROM bg GROUP BY 1)
      |SELECT b.doc_id,
      |       count(*) AS n_bigrams,
      |       CAST(sum(c.cfreq) AS BIGINT) AS total_freq,
      |       CAST(sum(c.cfreq) AS DOUBLE) / count(*) AS mean_bigram_freq
      |FROM bg b JOIN cf c ON b.bigram = c.bigram
      |GROUP BY b.doc_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      // r13 note: two rewrites were tried here and REVERTED after
      // measurement — (a) spreading the bigram explode (the exchange cost
      // more than the single-task explode), and (b) a (doc,bigram)-grain
      // localCheckpoint (re-materialized every run, ~0.8 s steady vs the
      // 0.25 s this original cached form reads on a quiet box). The
      // occurrence-grain cache materializes fine WITHOUT a repartition in
      // its plan; see NOTES r13 lesson 3 for the class that breaks it.
      val bg = Ngrams.postings(Tables.documents(s, dir), n = 2, distinct = false,
        outCol = "bigram", spread = false)
        .cache()
      val cf = bg.groupBy($"bigram").agg(count(lit(1)).as("cfreq"))
      bg.join(cf, "bigram")
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum($"cfreq").as("total_freq"))
        .select($"doc_id", $"n_bigrams", $"total_freq",
          ($"total_freq".cast("double") / $"n_bigrams").as("mean_bigram_freq"))
  }

  val chunkSize = 64
  val chunkStride = 48 // 16-token overlap between consecutive chunks

  /** T15: document chunking with overlap — split each doc into
    * `chunkSize`-token windows advancing by `chunkStride` (the
    * context-window splitter that feeds tokenization; overlap preserves
    * cross-boundary context). Pure narrow explode — integer arithmetic
    * and token-slice joins only, zero shuffle, scan-speed at any corpus
    * size.
    */
  val chunking = Q("t15_chunking",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
       |                  len(string_split(text, ' ')) AS n
       |           FROM documents),
       |c AS (SELECT doc_id, w, n,
       |        CASE WHEN n <= $chunkSize THEN 1
       |             ELSE ((n - $chunkSize + $chunkStride - 1) // $chunkStride) + 1 END AS n_chunks
       |      FROM t)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |       CAST(len(w[i * $chunkStride + 1 : i * $chunkStride + $chunkSize]) AS BIGINT) AS chunk_tokens,
       |       array_to_string(w[i * $chunkStride + 1 : i * $chunkStride + $chunkSize], ' ') AS chunk_text
       |FROM c, unnest(generate_series(0, n_chunks - 1)) AS s(i)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("n", size($"w"))
        .withColumn("n_chunks", expr(
          s"CASE WHEN n <= $chunkSize THEN 1 " +
            s"ELSE ((n - $chunkSize + $chunkStride - 1) div $chunkStride) + 1 END"))
        .select($"doc_id", $"w", explode(expr("sequence(0, n_chunks - 1)")).as("i"))
        .select($"doc_id", $"i".cast("long").as("chunk_id"),
          size(expr(s"slice(w, i * $chunkStride + 1, $chunkSize)")).cast("long").as("chunk_tokens"),
          expr(s"concat_ws(' ', slice(w, i * $chunkStride + 1, $chunkSize))").as("chunk_text"))
  }

  /** T16: longest repeated-word run per doc (the other Gopher repetition
    * rule: "aaa aaa aaa …" spam) via the gaps-and-islands idiom —
    * `pos − row_number() over (doc, word ORDER BY pos)` is constant within
    * a consecutive run, so runs become groups. Two window passes + one
    * aggregate, all partitioned by doc — integer-exact.
    */
  val maxWordRun = Q("t16_max_word_run",
    """WITH p AS (
      |  SELECT doc_id, w, pos
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |               generate_subscripts(string_split(text, ' '), 1) AS pos
      |        FROM documents)),
      |isl AS (SELECT doc_id, w,
      |               pos - row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS grp
      |        FROM p),
      |runs AS (SELECT doc_id, w, count(*) AS run_len
      |         FROM isl GROUP BY doc_id, w, grp)
      |SELECT doc_id, max(run_len) AS max_run
      |FROM runs GROUP BY doc_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val p = Tables.documents(s, dir)
        .select($"doc_id", posexplode(split($"text", " ")))
        .select($"doc_id", $"col".as("w"), ($"pos" + 1).as("pos"))
      val w = Window.partitionBy($"doc_id", $"w").orderBy($"pos")
      p.withColumn("grp", $"pos" - row_number().over(w))
        .groupBy($"doc_id", $"w", $"grp").agg(count(lit(1)).as("run_len"))
        .groupBy($"doc_id").agg(max($"run_len").as("max_run"))
  }

  /** T18: hashed-n-gram importance weighting for targeted data selection —
    * the DSIR shape (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling", arXiv:2302.03169): score every candidate
    * (raw) document by how much its hashed-bigram profile looks like the
    * TARGET distribution (here the `src0` split) relative to the raw pool,
    * then keep the top of the ranking.
    *
    * Bigrams hash into 256 buckets via `substr(md5(gram), 1, 2)` — the
    * cross-engine-stable stand-in for DSIR's hashed feature space. Rather
    * than a sum of per-bucket log-probability ratios (a float reduction
    * whose summation order differs across engines), the score keeps exact
    * integer evidence — `target_hits` = Σ target-bucket counts over the
    * doc's bigram occurrences, `raw_hits` = same against the raw pool —
    * and divides ONCE: `(target_hits+1)/(raw_hits+1)` (add-one smoothing).
    * One IEEE division of exact integers is bit-identical everywhere, so
    * the ranking is oracle-exact.
    *
    * Scale (100 TB): both count tables are ≤256 rows → broadcast; the
    * candidate side is touched twice (bucket counts, per-doc sum), each a
    * single partial-aggregated shuffle, linear in corpus n-grams. Nothing
    * here is quadratic and no driver-side state exceeds the 256-row maps.
    */
  val importanceWeight = Q("t18_importance_weight", {
    def grams(who: String) =
      s"""SELECT doc_id, substr(md5(g), 1, 2) AS b
         |FROM (SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
         |        for i in generate_series(1, greatest(len(w) - 1, 0))]) AS g
         |      FROM (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents WHERE source $who 'src0'))""".stripMargin
    s"""WITH tg AS (${grams("=")}),
       |cg AS (${grams("<>")}),
       |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS tcnt FROM tg GROUP BY b),
       |rc AS (SELECT b, CAST(count(*) AS BIGINT) AS rcnt FROM cg GROUP BY b),
       |per AS (
       |  SELECT doc_id,
       |         CAST(sum(coalesce(tcnt, 0)) AS BIGINT) AS target_hits,
       |         CAST(sum(rcnt) AS BIGINT) AS raw_hits
       |  FROM cg LEFT JOIN tc USING (b) JOIN rc USING (b)
       |  GROUP BY doc_id)
       |SELECT doc_id, target_hits, raw_hits,
       |       CAST(target_hits + 1 AS DOUBLE) / CAST(raw_hits + 1 AS DOUBLE) AS weight
       |FROM per
       |ORDER BY weight DESC, doc_id
       |LIMIT 100""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // ONE bigram explode over the corpus, immediately collapsed to the
    // (doc, bucket, is-target) grain — the r13 rewrite of a plan that
    // exploded the corpus THREE times (target counts, raw counts, raw
    // per-doc attach) and shipped occurrence-grain rows through both
    // broadcast joins (guide §2.3: aggregate before you shuffle, §2.4:
    // one subtree instead of three). Σ cnt_b·tcnt_b ≡ Σ_occurrences tcnt
    // exactly, so the integer evidence (and the oracle hash) is unchanged.
    val pb = Tables.spread(docs.select($"doc_id", $"source", $"text"))
      .select($"doc_id", ($"source" === "src0").as("tgt"), split($"text", " ").as("w"))
      .select($"doc_id", $"tgt", explode(expr(
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(1, size(w) - 1),
          |         i -> concat_ws(' ', w[i-1], w[i]))
          |  ELSE cast(array() AS array<string>) END""".stripMargin)).as("g"))
      .select($"doc_id", $"tgt", substring(md5($"g"), 1, 2).as("b"))
      .groupBy($"doc_id", $"tgt", $"b").agg(count(lit(1)).as("cnt"))
      // eager localCheckpoint, NOT cache(): the three consumers (both
      // 256-row count maps race as broadcast-subquery futures + the
      // per-doc attach) scan it concurrently, and r13 measured that a
      // .cache() here never materializes its buffers under that race —
      // every consumer of every run re-ran the explode (~30 executor-s).
      // The checkpoint materializes ONCE, before the consumers exist
      // (guide §5: localCheckpoint as the cheap lineage cut).
      .localCheckpoint(true)
    val tc = pb.filter($"tgt").groupBy($"b").agg(sum($"cnt").as("tcnt"))
    val rc = pb.filter(!$"tgt").groupBy($"b").agg(sum($"cnt").as("rcnt"))
    pb.filter(!$"tgt")
      .join(broadcast(tc), Seq("b"), "left")
      .join(broadcast(rc), Seq("b"))
      .groupBy($"doc_id")
      .agg(
        sum($"cnt" * coalesce($"tcnt", lit(0L))).as("target_hits"),
        sum($"cnt" * $"rcnt").as("raw_hits"))
      .select($"doc_id", $"target_hits", $"raw_hits",
        (($"target_hits" + lit(1)).cast("double") /
          ($"raw_hits" + lit(1)).cast("double")).as("weight"))
      .orderBy(desc("weight"), $"doc_id")
      .limit(100)
  }

  /** T19: cross-document duplicated-span fraction — for each doc, the
    * share of its 8-gram OCCURRENCES that also appear in at least one
    * OTHER document. The diagnostic behind substring-level dedup (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499, §ExactSubstr): a high fraction means the
    * doc is mostly boilerplate shared across the corpus even when no
    * whole-doc near-dup (d2–d4) fires.
    *
    * Exactness: both counts are integers; the fraction is one IEEE
    * division. A gram occurrence counts as duplicated iff the gram's
    * DISTINCT-doc frequency exceeds 1 — joining the distinct-gram list
    * back to occurrences is fanout-free (right side is unique by g).
    * Scale: explode → one hash-agg on the gram (partial-aggregated), one
    * equi-join on the gram, one per-doc agg — all linear in corpus
    * n-grams, no self-joins.
    */
  val dupSpanFraction = Q("t19_dup_span_fraction", {
    val grams =
      """SELECT doc_id, unnest([array_to_string(w[i:i+7], ' ')
        |        for i in generate_series(1, greatest(len(w) - 7, 0))]) AS g
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin
    s"""WITH g AS ($grams),
       |du AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
       |                      FROM g GROUP BY g) WHERE nd > 1)
       |SELECT t.doc_id,
       |       count(*) AS n_grams,
       |       count(*) FILTER (WHERE d.g IS NOT NULL) AS n_dup,
       |       CAST(count(*) FILTER (WHERE d.g IS NOT NULL) AS DOUBLE)
       |         / count(*) AS dup_fraction
       |FROM g t LEFT JOIN du d ON t.g = d.g
       |GROUP BY t.doc_id""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    val g = Ngrams.postings(Tables.documents(s, dir), n = 8, distinct = false,
      outCol = "g")
    // "gram appears in >1 distinct doc" ⟺ min(doc_id) ≠ max(doc_id)
    // within the gram's window — one pass over the single explode instead
    // of a countDistinct aggregate joined back (which re-derived the
    // explode on both shuffle sides; the t28/e32 double-eval class, r11)
    val byG = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    g.withColumn("dup",
        min($"doc_id").over(byG) =!= max($"doc_id").over(byG))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dup"))
      .select($"doc_id", $"n_grams", $"n_dup",
        ($"n_dup".cast("double") / $"n_grams").as("dup_fraction"))
  }

  /** T20: corpus health statistics per source — document count, token
    * count, vocabulary size, hapax-legomena count (words occurring
    * exactly once in the source), and type-token ratio. The first
    * dashboard a data-curation team builds: TTR and hapax mass shift
    * sharply when a source turns templated/boilerplate or a scrape breaks.
    * All counts are exact integers; TTR is one division — oracle-exact.
    *
    * Scale: explode → two hash-aggregates (word-level, then source-level)
    * and a 1-row-per-source join — linear in corpus tokens, partial
    * aggregation on both shuffles; the (source, word) aggregate carries
    * the vocabulary, not the corpus.
    */
  val corpusStats = Q("t20_corpus_stats",
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |               CAST(count(DISTINCT w) AS BIGINT) AS vocab
      |        FROM w GROUP BY source),
      |h AS (SELECT source, CAST(count(*) AS BIGINT) AS hapax
      |      FROM (SELECT source, w FROM w GROUP BY source, w HAVING count(*) = 1)
      |      GROUP BY source),
      |d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
      |SELECT d.source, n_docs, n_tokens, vocab,
      |       coalesce(hapax, 0) AS hapax,
      |       CAST(vocab AS DOUBLE) / n_tokens AS ttr
      |FROM d JOIN per USING (source) LEFT JOIN h USING (source)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val words = docs.select($"source", explode(split($"text", " ")).as("w"))
      val per = words.groupBy($"source")
        .agg(count(lit(1)).as("n_tokens"), countDistinct($"w").as("vocab"))
      val hap = words.groupBy($"source", $"w").agg(count(lit(1)).as("c"))
        .filter($"c" === 1)
        .groupBy($"source").agg(count(lit(1)).as("hapax"))
      docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .join(per, "source")
        .join(hap, Seq("source"), "left")
        .select($"source", $"n_docs", $"n_tokens", $"vocab",
          coalesce($"hapax", lit(0L)).as("hapax"),
          ($"vocab".cast("double") / $"n_tokens").as("ttr"))
  }

  /** C1/C2: the curation FUNNEL — the whole training-data pipeline as
    * one query, reporting per-stage attrition (docs and tokens) over the
    * train split:
    *
    *   s0 raw → s1 exact dedup (min-doc_id canonical per content hash)
    *   → s2 decontaminated (no 8-gram shared with the eval split, d6's
    *   rule) → [`fuzzy`: s2f fuzzy decontamination — drop any train doc
    *   whose MinHash-estimated Jaccard vs an eval doc is ≥ 0.5, d8's
    *   rule over the session-memoized d3 pair list]
    *   → s3 quality floor (≥8 words, distinct-word ratio ≥ 0.4)
    *   → s4 token budget (t12's per-source md5-order fill to 800).
    *
    * This is the composition story: every stage is an operator the engine
    * already gates individually (d1, d6, d8, t2/t11, t12), chained the
    * way a curation run actually chains them, with the stage counts a
    * data team watches. One builder emits BOTH gated variants (c1 plain,
    * c2 fuzzy) and both sides of each (Spark + oracle SQL) — a fix to a
    * shared stage cannot diverge them. All counts integer-exact;
    * oracle-exact.
    *
    * Scale: the survivor-set derivations are the underlying operators'
    * plans (hash-agg / broadcast n-gram join / anti-join), memoized as
    * slim ID sets; the stage COUNTS are then a single pass — every train
    * row is flagged with the stages it survives via ID-set joins, the
    * budget window runs once, and one aggregate + `stack` emits all
    * stage rows. The corpus is scanned exactly once per funnel run
    * (plus once per memo build), never once per stage.
    */
  private def funnelQ(name: String, fuzzy: Boolean): Q = Q(name, {
    def grams(src: String) =
      s"""SELECT doc_id, unnest([array_to_string(w[i:i+7], ' ')
         |        for i in generate_series(1, greatest(len(w) - 7, 0))]) AS g
         |FROM $src""".stripMargin
    val fuzzyPrefix = if (!fuzzy) "" else
      s"""${Dedup.minhashCtes},
         |pairs AS (${Dedup.minhashSelect}),
         |src AS (SELECT doc_id, source = 'src0' AS is_eval FROM documents),
         |fuzzy_contam AS (
         |  SELECT DISTINCT CASE WHEN sa.is_eval THEN p.doc_b ELSE p.doc_a END AS doc_id
         |  FROM pairs p JOIN src sa ON p.doc_a = sa.doc_id
         |               JOIN src sb ON p.doc_b = sb.doc_id
         |  WHERE sa.is_eval <> sb.is_eval),
         |""".stripMargin
    val fuzzyCte = if (!fuzzy) "" else
      "s2f AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM fuzzy_contam)),\n"
    val fuzzyStage = if (!fuzzy) "" else
      """UNION ALL SELECT 's2f_fuzzy_decontam', count(*),
        |       CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s2f
        |""".stripMargin
    val qualityIn = if (fuzzy) "s2f" else "s2"
    s"""WITH ${fuzzyPrefix}train AS (
       |  SELECT doc_id, source, text, string_split(text, ' ') AS w
       |  FROM documents WHERE source <> 'src0'),
       |s1 AS (
       |  SELECT t.doc_id, t.source, t.text, t.w FROM train t
       |  JOIN (SELECT md5(lower(text)) AS h, min(doc_id) AS keep
       |        FROM train GROUP BY 1) k
       |    ON md5(lower(t.text)) = k.h AND t.doc_id = k.keep),
       |eval_g AS (SELECT DISTINCT g FROM (${grams(
        "(SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE source = 'src0')")})),
       |contam AS (
       |  SELECT DISTINCT sg.doc_id
       |  FROM (${grams("s1")}) sg JOIN eval_g e ON sg.g = e.g),
       |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |${fuzzyCte}s3 AS (SELECT * FROM $qualityIn WHERE len(w) >= 8
       |         AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.4),
       |s4 AS (
       |  SELECT * FROM (
       |    SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tokens,
       |           sum(len(w)) OVER (PARTITION BY source
       |                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM s3) WHERE cum <= $mixBudget)
       |SELECT 's0_raw' AS stage, count(*) AS n_docs,
       |       CAST(coalesce(sum(len(w)), 0) AS BIGINT) AS n_tokens FROM train
       |UNION ALL SELECT 's1_exact_dedup', count(*),
       |       CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s1
       |UNION ALL SELECT 's2_decontaminated', count(*),
       |       CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s2
       |${fuzzyStage}UNION ALL SELECT 's3_quality', count(*),
       |       CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM s3
       |UNION ALL SELECT 's4_token_budget', count(*),
       |       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s4""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val train = docs.filter($"source" =!= "src0")
      .select($"doc_id", $"source", $"text", split($"text", " ").as("w"))
    // s1/s2 are the funnel's hot derived tables, shared by BOTH gated
    // variants (c1 and c2 differ only after s2) — session-memoized like
    // the d3 pair list, so the dedup aggregation and the 8-gram
    // decontamination join run once per (session, dir), not once per
    // funnel variant. What gets persisted is the survivor doc_id SET
    // ONLY (one bigint per row): most docs survive dedup, so memoizing
    // payload columns would pin text + the split-word array (~2× the
    // corpus) in executor storage for the session — at 100 TB that is
    // the difference between a key set and a second copy of the corpus.
    // Payload columns are rebuilt by joining back to the documents scan
    // at each use site.
    // ONE memo carries both stage memberships — (doc_id of every s1
    // survivor, in_s2 flag) — so the single-pass flagging below costs one
    // broadcast join, not two. Two bits per survivor instead of two
    // separate ID sets; the s2 set is definitionally a subset of s1.
    val stageIds = Memo.cached(s, dir, "funnel_stage_ids") {
      // the s1 survivors are exactly min(doc_id) per content-hash group
      val s1Ids = train.groupBy(md5(lower($"text")).as("h"))
        .agg(min($"doc_id").as("doc_id")).select($"doc_id")
      val s1 = train.join(s1Ids, Seq("doc_id"))
      val evalG = Ngrams.postings(docs.filter($"source" === "src0"),
        n = 8, distinct = true, outCol = "g").select($"g").distinct()
      val contam = Ngrams.postings(s1, n = 8, distinct = true, outCol = "g")
        .join(broadcast(evalG), "g").select($"doc_id").distinct()
      s1Ids.join(contam.withColumn("is_contam", lit(true)), Seq("doc_id"), "left")
        .select($"doc_id", (!coalesce($"is_contam", lit(false))).as("in_s2"))
    }
    // Single-pass stage counting (r5 VERDICT: each of the five stage
    // aggregates re-derived from `train`, so the union re-scanned and
    // re-split `documents` once per branch). Instead: flag every train
    // row with the stages it survives (left joins against the memoized
    // ID sets — unique doc_ids, so row multiplicity is preserved), run
    // the budget window once, and reduce in ONE aggregate, unpivoted to
    // stage rows with `stack`. One corpus scan total, still fully lazy.
    // The budget window now sorts all train rows (not just s3 survivors,
    // with non-survivors contributing 0 tokens — the running sum at each
    // s3 row is unchanged); survivor fraction is high, so the sort is
    // comparable and it beats a second corpus scan at any scale.
    // optional d8 stage: drop train docs with a cross-split MinHash match
    val withFlags = {
      val base = train
        .join(stageIds.withColumn("in_s1", lit(true)), Seq("doc_id"), "left")
      if (!fuzzy) base.withColumn("is_fc", lit(null).cast("boolean"))
      else {
        val src = docs.select($"doc_id", ($"source" === "src0").as("is_eval"))
        val fuzzyContam = Dedup.minhashPairs(s, dir)
          .join(src.select($"doc_id".as("doc_a"), $"is_eval".as("ea")), "doc_a")
          .join(src.select($"doc_id".as("doc_b"), $"is_eval".as("eb")), "doc_b")
          .filter($"ea" =!= $"eb")
          .select(when($"ea", $"doc_b").otherwise($"doc_a").as("doc_id"))
          .distinct()
        base.join(fuzzyContam.withColumn("is_fc", lit(true)), Seq("doc_id"), "left")
      }
    }
    val budgetW = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // project to narrow columns BEFORE the window: the sort exchange must
    // move (doc_id, source, n_tok, 4 booleans), never text or the split
    // word array — at 100 TB the payload through the window sort is the
    // whole cost
    val fIn1 = coalesce($"in_s1", lit(false))
    val fIn2 = coalesce($"in_s2", lit(false))
    val fIn2f = fIn2 && !coalesce($"is_fc", lit(false))
    val fIn3 = fIn2f && size($"w") >= 8 &&
      (size(array_distinct($"w")).cast("double") / size($"w")) >= 0.4
    val staged = withFlags
      .select($"doc_id", $"source",
        size($"w").cast("long").as("n_tok"),
        fIn1.as("in_s1"), fIn2.as("in_s2"), fIn2f.as("in_s2f"), fIn3.as("in_s3"))
      .withColumn("cum", sum(when($"in_s3", $"n_tok").otherwise(0L)).over(budgetW))
      .withColumn("in_s4", $"in_s3" && $"cum" <= mixBudget)
    def cnt(f: org.apache.spark.sql.Column) =
      coalesce(sum(when(f, 1L).otherwise(0L)), lit(0L))
    def tok(f: org.apache.spark.sql.Column) =
      coalesce(sum(when(f, $"n_tok").otherwise(0L)), lit(0L))
    val stageFlags: Seq[(String, org.apache.spark.sql.Column)] =
      Seq("s0_raw" -> lit(true), "s1_exact_dedup" -> $"in_s1",
        "s2_decontaminated" -> $"in_s2") ++
        (if (fuzzy) Seq("s2f_fuzzy_decontam" -> $"in_s2f") else Nil) ++
        Seq("s3_quality" -> $"in_s3", "s4_token_budget" -> $"in_s4")
    val aggExprs = stageFlags.zipWithIndex.flatMap { case ((_, f), i) =>
      Seq(cnt(f).as(s"c$i"), tok(f).as(s"t$i"))
    }
    val agg = staged.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = stageFlags.zipWithIndex
      .map { case ((n, _), i) => s"'$n', c$i, t$i" }.mkString(", ")
    agg.select(expr(
      s"stack(${stageFlags.size}, $stackArgs) AS (stage, n_docs, n_tokens)"))
  }

  val curationFunnel = funnelQ("c1_curation_funnel", fuzzy = false)
  val curationFunnelFuzzy = funnelQ("c2_curation_funnel_fuzzy", fuzzy = true)

  /** C3: the CANONICAL curation funnel — composes the r7 operators into
    * the end-to-end shape a dedup-first corpus build runs: near-dup
    * cluster the corpus (d5's connected components over the memoized LSH
    * pairs), keep ONE canonical doc per cluster by longest-copy-wins
    * (d10), drop length outliers outside the survivors' per-source exact
    * [P5, P95] band (t22's band, as a filter), then apply per-language
    * temperature quotas (t21's q_l ∝ √n_l with the pinned-order denom
    * fold; deterministic md5-ordered selection within each language,
    * t6/t17's sampling idiom). Four stage rows `(stage, n_docs,
    * n_chars)` — integer counts and sums, hash-exact.
    *
    * Scale: the cluster labels are computed once (memoized pair list +
    * adaptive union-find/BSP); each later stage is a narrow-column
    * window or broadcast join over a shrinking survivor set. The stage
    * populations are window-dependent (band over s1 only, ranks over s2
    * only), so the funnel chains rather than single-pass-flags — the
    * heavy input (clusters) is not recomputed, only re-joined.
    */
  /** The c3 funnel as DuckDB CTEs, through the s3 survivors (doc_id,
    * lang, n_chars) — ONE definition shared by c3's stage counts and
    * c4's release fingerprint.
    */
  private def curationCtes(budget: Int): String =
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |${graft.operators.DupClusters.ccCtes},
       |lab AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |               d.source, d.lang, d.n_chars
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
       |s1 AS (SELECT * FROM (
       |         SELECT lab.*, row_number() OVER (PARTITION BY cluster_id
       |                        ORDER BY n_chars DESC, doc_id) AS krn
       |         FROM lab) WHERE krn = 1),
       |p AS (SELECT source,
       |        percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS p05,
       |        percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS p95
       |      FROM s1 GROUP BY source),
       |s2 AS (SELECT s1.doc_id, s1.lang, s1.n_chars
       |       FROM s1 JOIN p ON s1.source = p.source
       |       WHERE s1.n_chars >= p.p05 AND s1.n_chars <= p.p95),
       |c AS (SELECT lang, sqrt(count(*)) AS w FROM s2 GROUP BY lang),
       |dn AS (SELECT sum(w ORDER BY lang) AS denom FROM c),
       |cap AS (SELECT c.lang,
       |               CAST(floor(CAST($budget AS DOUBLE) * c.w / dn.denom) AS BIGINT) AS cap
       |        FROM c, dn),
       |r AS (SELECT s2.doc_id, s2.lang, s2.n_chars,
       |             row_number() OVER (PARTITION BY s2.lang
       |                ORDER BY md5(CAST(s2.doc_id AS VARCHAR)), s2.doc_id) AS rn
       |      FROM s2),
       |s3 AS (SELECT r.doc_id, r.lang, r.n_chars FROM r JOIN cap ON r.lang = cap.lang
       |       WHERE r.rn <= cap.cap)""".stripMargin

  /** The c3 funnel's engine side: every doc labeled with its stage
    * membership flags (in_s1 canonical / in_s2 length band / in_s3 lang
    * quota). Single-pass (the c1 discipline): the memoized canonical
    * table carries in_s1; band and quota stats are small broadcast
    * aggregates over its survivors; the quota rank is a conditional
    * running count over one total order (≡ row_number among s2 rows —
    * no tie hazard). Shared by c3 (stage rollup) and c4 (release cut).
    */
  private def curationStaged(s: SparkSession, dir: String, budget: Int): DataFrame = {
    import s.implicits._
    val lab = graft.operators.DupClusters.canonicalQuery(s, dir)
      .join(Tables.documents(s, dir).select($"doc_id", $"source", $"lang"), "doc_id")
      .select($"doc_id", $"source", $"lang", $"n_chars", $"keep".as("in_s1"))
    val s1 = lab.filter($"in_s1")
    val p = s1.groupBy($"source").agg(
      expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").cast("long").as("p05"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").cast("long").as("p95"))
    val caps = s1.join(broadcast(p), "source")
      .filter($"n_chars" >= $"p05" && $"n_chars" <= $"p95")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .select($"lang", sqrt($"n").as("w"))
      .agg(sort_array(collect_list(struct($"lang", $"w"))).as("xs"))
      .select(explode($"xs").as("x"),
        expr("aggregate(xs, 0D, (acc, e) -> acc + e.w)").as("denom"))
      .select($"x.lang".as("lang"),
        floor(lit(budget.toDouble) * $"x.w" / $"denom").cast("long").as("cap"))
    val rw = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    // LEFT join: a source whose docs are all non-keeper members of
    // cross-source clusters has no s1 survivors and hence no band row —
    // its docs must still count in s0_raw (the oracle counts all of lab);
    // null band edges make in_s2 false via the null-safe coalesce
    lab
      .join(broadcast(p), Seq("source"), "left")
      .withColumn("in_s2", $"in_s1" &&
        coalesce($"n_chars" >= $"p05" && $"n_chars" <= $"p95", lit(false)))
      .join(broadcast(caps), Seq("lang"), "left")
      .withColumn("rn", sum(when($"in_s2", 1L).otherwise(0L)).over(rw))
      .withColumn("in_s3", $"in_s2" && $"rn" <= coalesce($"cap", lit(0L)))
  }

  val curationCanonical = Q("c3_curation_canonical", {
    val budget = 300
    s"""${curationCtes(budget)}
       |SELECT 's0_raw' AS stage, count(*) AS n_docs,
       |       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_chars FROM lab
       |UNION ALL SELECT 's1_canonical', count(*),
       |       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s1
       |UNION ALL SELECT 's2_length_band', count(*),
       |       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s2
       |UNION ALL SELECT 's3_lang_quota', count(*),
       |       CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s3""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    // four stage rows from ONE aggregate over the staged flags,
    // unpivoted with stack
    val staged = curationStaged(s, dir, 300)
    def cnt(f: org.apache.spark.sql.Column) =
      coalesce(sum(when(f, 1L).otherwise(0L)), lit(0L))
    def chars(f: org.apache.spark.sql.Column) =
      coalesce(sum(when(f, $"n_chars").otherwise(0L)), lit(0L))
    val flags: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "s0_raw" -> lit(true), "s1_canonical" -> $"in_s1",
      "s2_length_band" -> $"in_s2", "s3_lang_quota" -> $"in_s3")
    val aggExprs = flags.zipWithIndex.flatMap { case ((_, f), i) =>
      Seq(cnt(f).as(s"c$i"), chars(f).as(s"t$i"))
    }
    val stackArgs = flags.zipWithIndex
      .map { case ((n, _), i) => s"'$n', c$i, t$i" }.mkString(", ")
    staged.agg(aggExprs.head, aggExprs.tail: _*)
      .select(expr(s"stack(${flags.size}, $stackArgs) AS (stage, n_docs, n_chars)"))
  }

  /** C4: CORPUS RELEASE — the version cut a corpus build emits after
    * curation: the c3 funnel's s3 survivors fingerprinted per language
    * with the [[graft.operators.CorpusManifest]] arithmetic (count,
    * char total, order-independent bit_xor content hash, doc_id
    * watermark). This is the row a training run pins and a later audit
    * recomputes — c3 proves the funnel's attrition, c4 proves WHICH
    * corpus came out of it. Composes the round's two capstones (funnel +
    * manifest) under one hash gate.
    *
    * Scale: the staged flags are the memoized c3 computation; the
    * release cut adds one map-side-combinable aggregate over the
    * survivor rows — no new shuffle beyond the per-lang reduce.
    */
  val corpusRelease = Q("c4_corpus_release", {
    val budget = 300
    val h = Manifest.duckRowHash(Seq("doc_id", "lang", "n_chars"))
    s"""${curationCtes(budget)}
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       coalesce(bit_xor($h), 0) AS xor_hash,
       |       CAST(max(doc_id) AS BIGINT) AS watermark
       |FROM s3 GROUP BY lang""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    import graft.operators.CorpusManifest
    val h = CorpusManifest.rowHash(
      CorpusManifest.canonical(Seq($"doc_id", $"lang", $"n_chars")))
    curationStaged(s, dir, 300)
      .filter($"in_s3")
      .select($"lang", $"doc_id", $"n_chars", h.as("h"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("n_chars"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("xor_hash"),
        max($"doc_id").as("watermark"))
  }

  /** T24: CURRICULUM ORDERING — construct the first segment of a
    * training order: quality-ranked within each language (cleanest docs
    * first; quality = distinct-token ratio, the t2 signal that punishes
    * repetition), then languages INTERLEAVED round-robin by rank so no
    * early window is monolingual. The standard "curriculum + language
    * mixing" order-construction step between curation and sharding.
    *
    * Scale: the per-language ranking window partitions by lang (parallel
    * sort, no global exchange); the rank ≤ 100 prune caps the interleave
    * input at 100·|langs| rows, and the final TakeOrdered + row_number
    * run on that capped set — the only single-partition step touches
    * ≤ 500 rows regardless of corpus size.
    */
  val curriculumOrder = Q("t24_curriculum_order",
    """WITH q AS (
      |  SELECT doc_id, lang,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |           / len(string_split(text, ' ')) AS quality
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |                                   ORDER BY quality DESC, doc_id) AS lang_rank
      |      FROM q),
      |c AS (SELECT * FROM r WHERE lang_rank <= 100
      |      ORDER BY lang_rank, lang, doc_id LIMIT 100)
      |SELECT doc_id, lang, quality, lang_rank,
      |       row_number() OVER (ORDER BY lang_rank, lang, doc_id) AS train_order
      |FROM c""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val words = split($"text", " ")
      val byLang = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
      val capped = Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          (size(array_distinct(words)).cast("double") / size(words)).as("quality"))
        .withColumn("lang_rank", row_number().over(byLang))
        .filter($"lang_rank" <= 100)
        .orderBy($"lang_rank", $"lang", $"doc_id")
        .limit(100)
      capped.withColumn("train_order", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"lang_rank", $"lang", $"doc_id")))
  }

  /** DuckDB CTEs for the leakage-safe split: cluster labels (the d5
    * recursive closure) + the md5-of-cluster split assignment. Shared by
    * c5 (the assignment itself) and c6 (the cross-split overlap audit).
    *
    * The split key is `md5(cluster_id)` — NOT `md5(doc_id)` — so every
    * member of a near-dup cluster lands in the same split by
    * construction; thresholds 'e6'/'f3' cut the uniform hex space at
    * ≈ 0xe6/0x100 = 89.8% and 0xf3/0x100 = 94.9% (train/val/test).
    * Lexicographic compare of the lowercase-hex md5 string is identical
    * in Spark and DuckDB, so the assignment is cross-engine exact.
    */
  private val splitCtes: String =
    s"""WITH RECURSIVE ${Dedup.minhashCtes},
       |pairs AS (${Dedup.minhashSelect}),
       |${graft.operators.DupClusters.ccCtes},
       |lab AS (SELECT d.doc_id,
       |               coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |               CASE WHEN md5(CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)) < 'e6' THEN 'train'
       |                    WHEN md5(CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)) < 'f3' THEN 'val'
       |                    ELSE 'test' END AS split
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)""".stripMargin

  /** The engine-side split labels `(doc_id, cluster_id, split)` —
    * session-memoized (fixed-width key columns only, the Memo
    * discipline) because c5 emits it and c6 joins postings against it.
    */
  private def splitLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Memo.cached(s, dir, "c5_split_labels") {
      graft.operators.DupClusters.canonicalQuery(s, dir)
        .select($"doc_id", $"cluster_id")
        .withColumn("split_key", md5($"cluster_id".cast("string")))
        .select($"doc_id", $"cluster_id",
          when($"split_key" < "e6", "train")
            .when($"split_key" < "f3", "val")
            .otherwise("test").as("split"))
    }
  }

  /** C5: LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT — the assignment step an
    * eval-honest corpus build runs after near-dup clustering: the split
    * is a deterministic hash of the CLUSTER id, not the document id, so
    * two near-duplicate documents can never straddle the train/eval
    * boundary (the classic eval-leakage failure of per-doc random
    * splits). Train/val/test ≈ 89.8/5.1/5.1% by hex-threshold cut of
    * the uniform md5 space.
    *
    * Scale: cluster labels are the memoized d5/d10 computation; the
    * assignment itself is a stateless per-row projection — no shuffle
    * beyond what clustering already paid, and the same holds at 100 TB
    * (the hash needs no global coordination, unlike a percent_rank
    * split, which would need a full sort).
    */
  val leakageSafeSplit = Q("c5_leakage_safe_split",
    s"""$splitCtes
       |SELECT doc_id, cluster_id, split FROM lab""".stripMargin) {
    (s, dir) => splitLabels(s, dir)
  }

  /** C6: SPLIT-LEAKAGE AUDIT — the residual-contamination report run
    * AFTER c5: even with cluster-coherent assignment, eval docs can
    * share verbatim 8-grams with train docs the near-dup screen never
    * paired (below-threshold Jaccard, boilerplate phrases). Per eval
    * split: doc count, docs sharing ≥1 8-gram with ANY train doc,
    * the contamination rate, and the distinct shared-gram count — the
    * numbers a team reports next to its eval scores.
    *
    * Scale: d6's decontamination shape generalized — one distinct over
    * train postings, one hash equi-join on the gram key (linear in
    * postings, never pairwise in docs), then a two-distinct aggregate
    * over the hit set, which is bounded by eval-side postings (~10% of
    * the corpus). No broadcast of the train side (it is corpus-sized).
    */
  val splitLeakageAudit = Q("c6_split_leakage_audit",
    s"""$splitCtes,
       |grams AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+7], ' ')
       |            for i in generate_series(1, greatest(len(w) - 7, 0))])) AS g
       |          FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |sg AS (SELECT grams.doc_id, g, split FROM grams JOIN lab ON grams.doc_id = lab.doc_id),
       |train_g AS (SELECT DISTINCT g FROM sg WHERE split = 'train'),
       |hit AS (SELECT s.split, s.doc_id, s.g
       |        FROM sg s JOIN train_g t ON s.g = t.g WHERE s.split <> 'train'),
       |agg AS (SELECT split, count(DISTINCT doc_id) AS n_contaminated,
       |               count(DISTINCT g) AS n_shared_grams
       |        FROM hit GROUP BY split),
       |ev AS (SELECT split, count(*) AS n_docs FROM lab
       |       WHERE split <> 'train' GROUP BY split)
       |SELECT ev.split, ev.n_docs,
       |       coalesce(a.n_contaminated, 0) AS n_contaminated,
       |       CAST(coalesce(a.n_contaminated, 0) AS DOUBLE) / ev.n_docs AS contamination_rate,
       |       coalesce(a.n_shared_grams, 0) AS n_shared_grams
       |FROM ev LEFT JOIN agg a ON ev.split = a.split""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val labels = splitLabels(s, dir).select($"doc_id", $"split")
      val grams = Ngrams.postings(
        Tables.documents(s, dir), n = 8, distinct = true, outCol = "g")
      val sg = grams.join(labels, "doc_id")
      val trainG = sg.filter($"split" === "train").select($"g").distinct()
      val hits = sg.filter($"split" =!= "train").join(trainG, "g")
      val agg = hits.groupBy($"split")
        .agg(countDistinct($"doc_id").as("n_contaminated"),
          countDistinct($"g").as("n_shared_grams"))
      labels.filter($"split" =!= "train")
        .groupBy($"split").agg(count(lit(1)).as("n_docs"))
        .join(agg, Seq("split"), "left")
        .select($"split", $"n_docs",
          coalesce($"n_contaminated", lit(0L)).as("n_contaminated"),
          (coalesce($"n_contaminated", lit(0L)).cast("double") / $"n_docs")
            .as("contamination_rate"),
          coalesce($"n_shared_grams", lit(0L)).as("n_shared_grams"))
  }

  /** T30: EPOCH UPSAMPLING — materialize the training MULTISET from
    * fractional per-source epoch weights ("2.5 epochs of wiki"): every
    * doc is emitted floor(w) times, plus one more for the
    * deterministically-chosen frac(w) share of docs. t17 decides how
    * much of each source to take; this is the companion step that
    * actually emits the repeats a sequence-packing / sharding stage
    * consumes. The fractional draw is `(doc_id % 1000)/1000 < frac(w)`
    * — integer arithmetic, cross-engine exact, and stable under
    * re-partitioning (a rand() draw would make the multiset
    * partition-count-dependent). The weight table is a stand-in for the
    * externally-supplied mixture config (the c3 budget pattern).
    *
    * Scale: stateless per-row arithmetic + a bounded explode (≤ ⌈w_max⌉
    * replicas per doc) — no shuffle at all; output size is exactly the
    * token-weighted corpus the mixture asks for. The n_rep ≥ 1 CASE
    * guard matters: Spark's `sequence(1, 0)` is the DESCENDING [1, 0],
    * not empty (the Ngrams guard), so weightless docs must short-circuit.
    */
  val epochUpsample = Q("t30_epoch_upsample",
    """WITH w AS (SELECT doc_id, source,
      |             1.0 + CAST(CAST(substr(source, 4) AS INTEGER) % 4 AS DOUBLE) * 0.5 AS w
      |           FROM documents),
      |r AS (SELECT doc_id, source, w,
      |             CAST(floor(w) AS BIGINT)
      |               + CASE WHEN CAST(doc_id % 1000 AS DOUBLE) / 1000.0 < w - floor(w)
      |                      THEN 1 ELSE 0 END AS n_rep
      |      FROM w)
      |SELECT doc_id, source, w, n_rep,
      |       CAST(unnest(generate_series(1, CAST(n_rep AS INTEGER))) AS BIGINT) AS epoch
      |FROM r""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", $"source",
          (lit(1.0) + (substring($"source", 4, 10).cast("int") % 4).cast("double") * 0.5).as("w"))
        .withColumn("n_rep", floor($"w").cast("long") +
          when(($"doc_id" % 1000).cast("double") / 1000.0 < $"w" - floor($"w"), 1L)
            .otherwise(0L))
        .select($"doc_id", $"source", $"w", $"n_rep",
          explode(expr(
            "CASE WHEN n_rep >= 1 THEN sequence(1L, n_rep) ELSE cast(array() AS array<bigint>) END"))
            .as("epoch"))
  }

  /** T34: BM25 ranked retrieval — t10's production-grade sibling with the
    * two things raw TF-IDF lacks: TERM-FREQUENCY SATURATION (k1 = 1.2 —
    * the 50th "fast" adds almost nothing) and DOCUMENT-LENGTH
    * normalization (b = 0.75 — long docs stop winning by volume alone).
    *
    * Exactness: the whole score is ALL-INTEGER, so the 3-term sum is
    * order-free and hash-exact. ln is avoided deliberately (the dq5
    * rationale: libm isn't correctly rounded), keeping the Robertson idf
    * as its rational odds (2N−2df+1)/(2df+1) — rank-equivalent
    * monotone in df. With k1 = 6/5 and b = 3/4 the saturation term
    * clears denominators exactly:
    *   tf_sat = 44·A·tf / (20·A·tf + 6·A + 1800·dl)
    * where A = (100·L) div D is centiword average doc length, and
    *   score_t = (idf_scaled · 44·A·tf) div (20·A·tf + 6·A + 1800·dl),
    *   idf_scaled = ((2N−2df+1)·10000) div (2df+1).
    * Every operand is int64 with headroom through ~sf10 (bounds in
    * code); both engines floor positive integer division identically.
    *
    * Shape: corpus stats are ONE broadcast row; scoring is a narrow
    * projection at scan speed; top-20 is a TakeOrdered — the same
    * 100 TB plan as t10.
    */
  val bm25Search = Q("t34_bm25", {
    val tfCols = terms.map(t =>
      s"CAST(len([w for w in string_split(text, ' ') if w = '$t']) AS BIGINT) AS tf_$t").mkString(", ")
    val dfCols = terms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(", ")
    val score = terms.map(t =>
      s"""(((((2 * n - 2 * df_$t + 1) * 10000) // (2 * df_$t + 1)) * (44 * a * tf_$t))
         | // (20 * a * tf_$t + 6 * a + 1800 * dl))""".stripMargin.replace("\n", ""))
      .mkString(" + ")
    s"""WITH tf AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |                   $tfCols
       |            FROM documents),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |                 (100 * CAST(sum(dl) AS BIGINT)) // CAST(count(*) AS BIGINT) AS a,
       |                 $dfCols
       |          FROM tf)
       |SELECT doc_id, CAST($score AS BIGINT) AS score
       |FROM tf, stats
       |WHERE $score > 0
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }) {
    (s, dir) =>
      import s.implicits._
      val words = split($"text", " ")
      val tf = Tables.documents(s, dir)
        .select(($"doc_id" +: size(words).cast("long").as("dl") +:
          terms.map(t => size(filter(words, w => w === t)).cast("long").as(s"tf_$t"))): _*)
      val statCols = count(lit(1)).cast("long").as("n") +:
        expr("(100 * sum(dl)) div count(*)").as("a") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).cast("long").as(s"df_$t"))
      val stats = tf.agg(statCols.head, statCols.tail: _*)
      // int64 headroom: idf_scaled ≤ (2N+1)·10⁴, its product with
      // 44·A·tf ≤ ~3·10¹⁸ at N≈6·10⁵, A≈10⁴, tf≈10³ — under 2⁶³;
      // beyond ~sf10 promote SCALE or go DECIMAL(38,0)
      val score = terms.map(t => expr(
        s"""((((2 * n - 2 * df_$t + 1) * 10000) div (2 * df_$t + 1)) * (44 * a * tf_$t))
           | div (20 * a * tf_$t + 6 * a + 1800 * dl)""".stripMargin.replace("\n", "")))
        .reduce(_ + _)
      tf.crossJoin(broadcast(stats))
        .select($"doc_id", score.cast("long").as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(20)
  }

  /** M3: MULTIMODAL BATCH COMPOSITION — interleave two modalities into
    * fixed-shape training batches at a declared ratio (6 text + 2 vision
    * per 8-slot batch, vision pinned at slots 3 and 7 for even spacing),
    * the step between per-modality curation (t-series, m1/m2) and the
    * data loader: a multimodal trainer consumes BATCHES with a stable
    * modality mix, not two independent streams.
    *
    * Determinism without `rand()`: each modality is shuffled by
    * `md5(id)` (the engine's seeded-order idiom — portable, stable
    * under partitioning), ranked once, and mapped to
    * (batch = rank div per-batch-count, slot = fixed position map).
    * Trailing items that cannot fill a COMPLETE batch in BOTH
    * modalities are dropped — batch count = min(⌊text/6⌋, ⌊vision/2⌋) —
    * so every emitted batch has the exact declared shape (ragged final
    * batches break fixed-shape collation; the drop is the contract, and
    * it is ≤ 7 items).
    *
    * Scale shape: one window rank per modality (total sort — at 100 TB
    * replace with a per-partition rank + partition-offset table, the
    * w19 prefix-scan idiom) + a 1-row batch-count broadcast; no joins
    * between the modalities at all.
    */
  val modalityInterleave = Q("m3_modality_interleave",
    """WITH t AS (
      |  SELECT doc_id AS item_id,
      |         row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rn
      |  FROM documents),
      |v AS (
      |  SELECT vec_id AS item_id,
      |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
      |  FROM embeddings),
      |nb AS (
      |  SELECT least((SELECT count(*) FROM t) // 6, (SELECT count(*) FROM v) // 2) AS n_batches)
      |SELECT * FROM (
      |  SELECT CAST(t.rn // 6 AS BIGINT) AS batch_id,
      |         CAST(CASE WHEN t.rn % 6 < 3 THEN t.rn % 6 ELSE t.rn % 6 + 1 END AS BIGINT) AS slot,
      |         'text' AS modality, CAST(t.item_id AS BIGINT) AS item_id
      |  FROM t, nb WHERE t.rn // 6 < nb.n_batches
      |  UNION ALL
      |  SELECT CAST(v.rn // 2 AS BIGINT), CAST(3 + (v.rn % 2) * 4 AS BIGINT),
      |         'vision', CAST(v.item_id AS BIGINT)
      |  FROM v, nb WHERE v.rn // 2 < nb.n_batches)""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      def ranked(df: DataFrame, idCol: String): DataFrame =
        df.select(col(idCol).as("item_id"))
          .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(md5(col("item_id").cast("string")), col("item_id"))) - 1)
      val t = ranked(Tables.documents(s, dir), "doc_id")
      val v = ranked(Tables.embeddings(s, dir), "vec_id")
      val nb = t.agg((count(lit(1)) / 6).cast("long").as("nt"))
        .crossJoin(v.agg((count(lit(1)) / 2).cast("long").as("nv")))
        .select(least($"nt", $"nv").as("n_batches"))
      val text = t.crossJoin(broadcast(nb))
        .filter(expr("rn div 6") < $"n_batches")
        .select(expr("rn div 6").cast("long").as("batch_id"),
          when($"rn" % 6 < 3, $"rn" % 6).otherwise($"rn" % 6 + 1).cast("long").as("slot"),
          lit("text").as("modality"), $"item_id".cast("long").as("item_id"))
      val vis = v.crossJoin(broadcast(nb))
        .filter(expr("rn div 2") < $"n_batches")
        .select(expr("rn div 2").cast("long").as("batch_id"),
          (lit(3) + ($"rn" % 2) * 4).cast("long").as("slot"),
          lit("vision").as("modality"), $"item_id".cast("long").as("item_id"))
      text.unionByName(vis)
  }

  val queries: Seq[Q] = Seq(gopherQuality, seqPacking, stratifiedSample, tfidfSearch,
    qualityDeciles, tokenBudgetMix, piiScrub, bigramLmScore, chunking, maxWordRun,
    importanceWeight, dupSpanFraction, corpusStats, curationFunnel, curationFunnelFuzzy,
    curationCanonical, corpusRelease, curriculumOrder, leakageSafeSplit, splitLeakageAudit,
    epochUpsample, bm25Search, modalityInterleave)
}
