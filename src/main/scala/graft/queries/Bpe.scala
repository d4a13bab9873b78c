package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** T23: REAL byte-pair encoding over the corpus — t1's "BPE-ish regex"
  * upgraded to the actual algorithm (Sennrich et al. 2016,
  * arXiv:1508.07909): train a merges table from integer-ranked adjacent
  * pair counts, apply the merges in rank order, count tokens per doc.
  *
  * EXACTNESS (the Lloyd discipline applied to BPE): training state is all
  * integers and strings — pair counts are exact longs, the argmax
  * tie-break is total (count DESC, then lexicographic left, right), and
  * merge application is left-to-right non-overlapping — so both engines
  * walk the identical merge trajectory and the per-doc token counts
  * hash-match. The oracle replays training as M unrolled MATERIALIZED
  * CTE rounds (materialization matters: each round is referenced twice —
  * by the next round and by the argmax — and inlining would re-evaluate
  * the whole prefix per round, 2^M blowup).
  *
  * SCALE SHAPE (and why Spark does not mirror the CTE chain): BPE
  * training operates on the word-FREQUENCY table, not the corpus — one
  * distributed explode+aggregate builds `(word, freq)`, a deterministic
  * top-`vocabCap` keeps the trained vocabulary bounded
  * ([[graft.operators.IvfIndex]]'s sample-bounded-training rule), and the
  * M merge rounds run driver-side over that bounded table (pure integer
  * Scala, microseconds). APPLICATION is fully distributed and join-free:
  * the learned merges are LITERALS, so tokenizing every distinct word is
  * one narrow projection — M nested literal `replace` calls inside
  * whole-stage codegen — and per-doc counts are an explode + broadcast
  * join on the distinct-word table + one aggregate. Chaining the training
  * rounds as Spark plans instead would nest each round's subplan twice
  * per level (the same 2^M explosion the oracle avoids with
  * MATERIALIZED).
  *
  * Token-boundary encoding: a word's tokenization is `|t1|t2|…|tn|` —
  * every token wrapped in `|` delimiters (absent from the corpus), so the
  * literal replace `|l|r|` → `|lr|` merges exactly at token boundaries
  * and left-to-right scanning reproduces BPE's non-overlapping rule in
  * both engines.
  */
object Bpe {

  val numMerges = 12

  /** Trained-vocabulary bound: training sees the top-`vocabCap` words by
    * (freq DESC, word). Inert at every tested SF (the synthetic corpus
    * has ~31 distinct words); at real scale it is what keeps the
    * driver-side training table bounded. The cap is replicated in the
    * oracle SQL, so parity holds even if a corpus ever exceeds it.
    */
  val vocabCap = 4096

  /** Left-to-right non-overlapping merge of (l, r) → l+r over a token
    * sequence — the exact semantics of `replace(st, "|l|r|", "|lr|")`.
    */
  private def applyMerge(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side BPE training over a word-frequency table: `m` rounds of
    * exact pair counting + (count DESC, l, r) argmax. A round with no
    * pairs left emits the `("", "")` sentinel (a no-op replace), matching
    * the oracle's sentinel row, so the merge list always has length `m`.
    */
  def trainMerges(vocab: Seq[(String, Long)], m: Int): Seq[(String, String)] = {
    var states = vocab.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty), f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    while (k < m) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      states.foreach { case (toks, f) =>
        var i = 0
        while (i + 1 < toks.length) {
          val p = (toks(i), toks(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      val (l, r) =
        if (counts.isEmpty) ("", "")
        else counts.toSeq.minBy { case ((pl, pr), c) => (-c, pl, pr) }._1
      merges += ((l, r))
      if (l.nonEmpty)
        states = states.map { case (toks, f) => (applyMerge(toks, l, r), f) }
      k += 1
    }
    merges.result()
  }

  /** The deterministic capped word-frequency table and its trained merge
    * list, session-memoized (Bench min-of-2 and the spec reuse it).
    */
  def merges(s: SparkSession, dir: String): Seq[(String, String)] =
    Memo.cachedValue(s, dir, "t23_bpe_merges") {
      import s.implicits._
      val vocab = Tables.documents(s, dir)
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), $"word")
        .limit(vocabCap)
        .as[(String, Long)].collect().toSeq
      trainMerges(vocab, numMerges)
    }

  /** The shared merge-training/application CTE chain; `finalSelect` runs
    * over `docw (doc_id, lang, word) ⋈ fin (word, n_tok)`.
    */
  private def oracleSqlWith(finalSelect: String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += "w0 AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)"
    ctes +=
      s"""vocab AS MATERIALIZED (
         |  SELECT word, freq FROM (
         |    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w0 GROUP BY word)
         |  QUALIFY row_number() OVER (ORDER BY freq DESC, word) <= $vocabCap)""".stripMargin
    ctes +=
      """s0 AS MATERIALIZED (SELECT word, freq,
        |  '|' || array_to_string([word[i] for i in generate_series(1, len(word))], '|') || '|' AS st
        |  FROM vocab)""".stripMargin
    for (k <- 1 to numMerges) {
      val p = k - 1
      ctes +=
        s"""p$k AS MATERIALIZED (SELECT u['l'] AS l, u['r'] AS r, sum(freq) AS cnt FROM (
           |  SELECT freq, unnest(CASE WHEN len(t) >= 2
           |           THEN [{'l': t[i], 'r': t[i+1]} for i in generate_series(1, len(t)-1)]
           |           ELSE [] END) AS u
           |  FROM (SELECT freq, list_filter(string_split(st, '|'), x -> x <> '') AS t FROM s$p))
           |  GROUP BY 1, 2)""".stripMargin
      ctes +=
        s"""b$k AS MATERIALIZED (SELECT l, r FROM (
           |  SELECT l, r, cnt FROM p$k UNION ALL SELECT '', '', CAST(-1 AS BIGINT))
           |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
      ctes +=
        s"""s$k AS MATERIALIZED (SELECT word, freq,
           |  replace(st, '|' || b.l || '|' || b.r || '|', '|' || b.l || b.r || '|') AS st
           |  FROM s$p, b$k b)""".stripMargin
    }
    // application side: apply the learned merges to EVERY distinct word
    // (the capped vocab only bounds training), then count per doc
    val appChain = (1 to numMerges).foldLeft("st0") { (acc, k) =>
      s"replace($acc, '|' || (SELECT l FROM b$k) || '|' || (SELECT r FROM b$k) || '|', " +
        s"'|' || (SELECT l FROM b$k) || (SELECT r FROM b$k) || '|')"
    }
    s"""WITH ${ctes.result().mkString(",\n")},
       |allw AS (SELECT DISTINCT word FROM w0),
       |app AS MATERIALIZED (SELECT word,
       |  '|' || array_to_string([word[i] for i in generate_series(1, len(word))], '|') || '|' AS st0
       |  FROM allw),
       |fin AS (SELECT word,
       |  CAST(len(list_filter(string_split($appChain, '|'), x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM app),
       |docw AS (SELECT doc_id, lang, source, unnest(string_split(text, ' ')) AS word FROM documents)
       |$finalSelect""".stripMargin
  }

  private def oracleSql: String = oracleSqlWith {
    val mergeStr = (1 to numMerges)
      .map(k => s"(SELECT l || '+' || r FROM b$k)").mkString(" || ';' || ")
    s"""SELECT d.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(len(d.word)) AS BIGINT) AS n_chars,
       |       CAST(sum(f.n_tok) AS BIGINT) AS n_tokens_bpe,
       |       CAST(sum(f.n_tok) AS DOUBLE) / sum(len(d.word)) AS tokens_per_char,
       |       $mergeStr AS merges
       |FROM docw d JOIN fin f USING (word)
       |GROUP BY d.doc_id""".stripMargin
  }

  private def fertilityOracleSql: String = oracleSqlWith(
    """SELECT d.lang,
      |       CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(f.n_tok) AS BIGINT) AS n_tokens_bpe,
      |       CAST(sum(f.n_tok) AS DOUBLE) / count(*) AS fertility,
      |       CAST(sum(len(d.word)) AS DOUBLE) / sum(f.n_tok) AS chars_per_token
      |FROM docw d JOIN fin f USING (word)
      |GROUP BY d.lang""".stripMargin)

  val bpeTokenize = Q("t23_bpe_tokenize", oracleSql) {
    (s, dir) =>
      import s.implicits._
      val ms = merges(s, dir)
      val mergesStr = ms.map { case (l, r) => s"$l+$r" }.mkString(";")
      // tokenize every distinct word: one codegen projection of M nested
      // literal replaces — join-free, no training state on the executors.
      // (split on the empty regex keeps a trailing "" element — drop it,
      // matching the oracle's generate_series char list exactly)
      val st0 = concat(lit("|"),
        array_join(filter(split($"word", ""), x => x =!= ""), "|"), lit("|"))
      val stFinal = ms.foldLeft(st0) { case (acc, (l, r)) =>
        if (l.isEmpty) acc
        else call_function("replace", acc, lit(s"|$l|$r|"), lit(s"|$l$r|"))
      }
      val words = Tables.documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("word"))
      val fin = words.select($"word").distinct()
        .select($"word",
          size(filter(split(stFinal, "\\|"), x => x =!= "")).cast("long").as("n_tok"))
      words.join(broadcast(fin), "word")
        .groupBy($"doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          sum(length($"word")).as("n_chars"),
          sum($"n_tok").as("n_tokens_bpe"))
        .select($"doc_id", $"n_words", $"n_chars", $"n_tokens_bpe",
          ($"n_tokens_bpe".cast("double") / $"n_chars").as("tokens_per_char"),
          lit(mergesStr).as("merges"))
  }

  /** T25: TOKENIZER FERTILITY per language — tokens-per-word (fertility)
    * and chars-per-token under the t23-trained BPE. The standard
    * multilingual-tokenizer diagnostic: a language whose fertility is 2×
    * another's pays 2× the context budget per word, which is exactly what
    * t21's temperature mix must correct for. Same merge list, same
    * codegen replace-chain application; one extra groupBy(lang) —
    * everything heavy is shared with (and memoized by) t23.
    */
  val tokenizerFertility = Q("t25_tokenizer_fertility", fertilityOracleSql) {
    (s, dir) =>
      import s.implicits._
      val ms = merges(s, dir)
      val st0 = concat(lit("|"),
        array_join(filter(split($"word", ""), x => x =!= ""), "|"), lit("|"))
      val stFinal = ms.foldLeft(st0) { case (acc, (l, r)) =>
        if (l.isEmpty) acc
        else call_function("replace", acc, lit(s"|$l|$r|"), lit(s"|$l$r|"))
      }
      val words = Tables.documents(s, dir)
        .select($"lang", explode(split($"text", " ")).as("word"))
      val fin = words.select($"word").distinct()
        .select($"word",
          size(filter(split(stFinal, "\\|"), x => x =!= "")).cast("long").as("n_tok"))
      words.join(broadcast(fin), "word")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_words"),
          sum($"n_tok").as("n_tokens_bpe"),
          sum(length($"word")).as("n_chars"))
        .select($"lang", $"n_words", $"n_tokens_bpe",
          ($"n_tokens_bpe".cast("double") / $"n_words").as("fertility"),
          ($"n_chars".cast("double") / $"n_tokens_bpe").as("chars_per_token"))
  }

  private def fertilityDrilldownOracleSql: String = oracleSqlWith(
    """SELECT d.source, d.lang,
      |       CAST(count(*) AS BIGINT) AS n_words,
      |       CAST(sum(f.n_tok) AS BIGINT) AS n_tokens_bpe,
      |       CAST(sum(f.n_tok) AS DOUBLE) / count(*) AS fertility
      |FROM docw d JOIN fin f USING (word)
      |GROUP BY d.source, d.lang""".stripMargin)

  /** T27: fertility drill-down per (source, lang) — t25's diagnostic at
    * the grain where the fix is applied: a SINGLE source whose fertility
    * is off for one language (bad OCR, encoding damage, markup bleed) is
    * actionable (drop or re-extract the source), where t25's corpus-wide
    * number only says something is wrong somewhere. Same memoized merge
    * list, same codegen replace-chain; only the final grouping changes —
    * the marginal cost over t25 is one different shuffle key.
    */
  val fertilityDrilldown = Q("t27_fertility_drilldown", fertilityDrilldownOracleSql) {
    (s, dir) =>
      import s.implicits._
      val ms = merges(s, dir)
      val st0 = concat(lit("|"),
        array_join(filter(split($"word", ""), x => x =!= ""), "|"), lit("|"))
      val stFinal = ms.foldLeft(st0) { case (acc, (l, r)) =>
        if (l.isEmpty) acc
        else call_function("replace", acc, lit(s"|$l|$r|"), lit(s"|$l$r|"))
      }
      val words = Tables.documents(s, dir)
        .select($"source", $"lang", explode(split($"text", " ")).as("word"))
      val fin = words.select($"word").distinct()
        .select($"word",
          size(filter(split(stFinal, "\\|"), x => x =!= "")).cast("long").as("n_tok"))
      words.join(broadcast(fin), "word")
        .groupBy($"source", $"lang")
        .agg(
          count(lit(1)).as("n_words"),
          sum($"n_tok").as("n_tokens_bpe"))
        .select($"source", $"lang", $"n_words", $"n_tokens_bpe",
          ($"n_tokens_bpe".cast("double") / $"n_words").as("fertility"))
  }

  val queries: Seq[Q] = Seq(bpeTokenize, tokenizerFertility, fertilityDrilldown)
}
