package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators (text01-text17): token stats, quality scoring,
  * language ID, fingerprinting, tf-idf, PII scrub, repetition/entropy/
  * readability metrics, hashed classifier, Zipf audit — each with an
  * exact DuckDB oracle. Split out of ExtQueries in round 9 (registry
  * hygiene); queries and oracles are byte-identical to their pre-split
  * forms.
  */
object TextQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    GraftQuery(
      "text01_token_stats",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TA.tokenCount(col("text")).as("n_tokens"),
        TA.regexTokenCount(col("text")).as("n_subwords"),
        length(col("text")).as("len")),
      Some(s"""SELECT doc_id, ${TA.Sql.tokenCount("text")} AS n_tokens,
        ${TA.Sql.regexTokenCount("text")} AS n_subwords,
        length(text) AS len FROM documents"""),
    ),

    // ------------------------------------------------------------------
    GraftQuery(
      "text02_quality",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TA.punctCount(col("text")).as("n_punct"),
        TA.digitCount(col("text")).as("n_digit"),
        TA.stopwordCount(col("text")).as("n_stop"),
        TA.meanTokenLen(col("text")).as("mean_tok_len"),
        TA.qualityScore(col("text")).as("quality")),
      Some(s"""SELECT doc_id, ${TA.Sql.punctCount("text")} AS n_punct,
        ${TA.Sql.digitCount("text")} AS n_digit,
        ${TA.Sql.stopwordCount("text")} AS n_stop,
        ${TA.Sql.meanTokenLen("text")} AS mean_tok_len,
        ${TA.Sql.qualityScore("text")} AS quality FROM documents"""),
    ),

    // ------------------------------------------------------------------
    GraftQuery(
      "text03_langid",
      (s, d) => {
        val scored = Tables.documents(s, d).select(
          col("doc_id") +: col("lang") +:
            TA.LangMarkers.map { case (l, _) => TA.langScore(col("text"), l).as(s"s_$l") }: _*)
        val best = TA.LangMarkers.map { case (l, _) => col(s"s_$l") }.reduce(greatest(_, _))
        val pick = TA.LangMarkers.foldRight(lit("unknown"): Column) { case ((l, _), el) =>
          when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(el)
        }
        scored.withColumn("guess", pick)
          .withColumn("hit", (col("guess") === col("lang")).cast("int"))
      },
      Some {
        val scores = TA.LangMarkers.map { case (l, _) =>
          s"${TA.Sql.langScore("text", l)} AS s_$l"
        }.mkString(", ")
        val best = TA.LangMarkers.map { case (l, _) => s"s_$l" }
          .reduce((a, b) => s"greatest($a, $b)")
        val chain = TA.LangMarkers.map { case (l, _) =>
          s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
        }.mkString(" ")
        val scoreCols = TA.LangMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")
        s"""SELECT doc_id, lang, $scoreCols,
          CASE $chain ELSE 'unknown' END AS guess,
          CAST(CASE $chain ELSE 'unknown' END = lang AS INT) AS hit
          FROM (SELECT doc_id, lang, $scores FROM documents)"""
      },
    ),

    // ------------------------------------------------------------------
    GraftQuery(
      "text04_fingerprint",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TA.fingerprint(col("text")).as("fp"),
        TA.hash60(col("text")).as("h60")),
      Some(s"""SELECT doc_id, ${TA.Sql.fingerprint("text")} AS fp,
        ${TA.Sql.hash60("text")} AS h60 FROM documents"""),
    ),

    // ------------------------------------------------------------------
    // word-bigram top-k per language (n-gram frequency analysis).
    GraftQuery(
      "text05_bigram_topk",
      (s, d) => {
        // tokens bound to a column first — unbound split() inside the
        // lambda re-runs the regex per element_at (the text13 finding)
        val toks = col("toks")
        val bigrams = when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
          .otherwise(array().cast("array<string>"))
        val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram").asc)
        Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("lang"), TA.tokens(col("text")).as("toks"))
          .select(col("lang"), explode(bigrams).as("bigram"))
          .groupBy(col("lang"), col("bigram"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
      },
      Some(s"""WITH t AS (SELECT lang, ${TA.Sql.tokens("text")} AS toks FROM documents),
        b AS (SELECT lang, unnest(list_transform(range(1, len(toks)),
          i -> concat_ws(' ', toks[i], toks[i+1]))) AS bigram FROM t),
        c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2)
        SELECT lang, bigram, n, rnk FROM (
          SELECT lang, bigram, n,
            row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rnk
          FROM c) WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // TF-IDF top terms per document. ln() differs across engines in the
    // last ulp, so the score quantizes to an integer micro-score before
    // ranking — ordering is then fully integer-deterministic.
    GraftQuery(
      "text06_tfidf_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val terms = docs
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = terms.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
          .withColumn("score_micro",
            col("tf") * round(log(col("n_docs").cast("double") / col("df")) * 1000000.0).cast("long"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score_micro").desc, col("term").asc)
        scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score_micro"), col("rnk"))
      },
      Some(s"""WITH terms AS (
          SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, term, tf, df,
            tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1000000.0) AS BIGINT) AS score_micro
          FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, score_micro, rnk FROM (
          SELECT doc_id, term, tf, df, score_micro,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score_micro DESC, term ASC) AS rnk
          FROM scored) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // PII scrubbing: redact phone-number-shaped spans from a text rendering
    // of customer records (the reduced test schema has no phone column, so a
    // deterministic phone-like string is derived from the keys); count
    // redactions, fingerprint the scrubbed text. One codegen'd projection —
    // at corpus scale this is a pure map stage.
    GraftQuery(
      "text07_pii_scrub",
      (s, d) => {
        val phoneRe = "\\d[\\d()\\s-]{6,}\\d"
        val phone = concat(
          (col("c_nationkey") + 10).cast("string"), lit("-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"), lit("-"),
          lpad(((col("c_custkey") * 7) % 10000).cast("string"), 4, "0"))
        val txt = concat_ws(" ", col("c_name"), phone, col("c_mktsegment"))
        Tables.customer(s, d).select(
          col("c_custkey"),
          size(regexp_extract_all(txt, lit(phoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(txt, phoneRe, "<PHONE>")).as("scrub_fp"))
      },
      Some("""WITH t AS (SELECT c_custkey, concat_ws(' ', c_name,
            concat(CAST(c_nationkey + 10 AS VARCHAR), '-',
              lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), '-',
              lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')),
            c_mktsegment) AS txt FROM customer)
        SELECT c_custkey,
          len(regexp_extract_all(txt, '\d[\d()\s-]{6,}\d')) AS n_phones,
          md5(regexp_replace(txt, '\d[\d()\s-]{6,}\d', '<PHONE>', 'g')) AS scrub_fp
        FROM t"""),
    ),

    // ------------------------------------------------------------------
    // repetition quality filters (Gopher/C4-style): token-level duplicate
    // fraction and most-common-token share per document. Shape: explode →
    // (doc, token) counts → per-doc rollup — one shuffle, map-side combined,
    // the scalable layout for corpus-wide repetition stats.
    GraftQuery(
      "text08_repetition",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
        toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("cnt")).as("top_cnt"))
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"),
            (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_frac"),
            (col("top_cnt").cast("double") / col("n_tokens")).as("top_frac"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS tok FROM documents),
        c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          count(*) AS n_distinct,
          1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS dup_frac,
          CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS top_frac
        FROM c GROUP BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // Per-document token-distribution entropy H = Σ (c/n)·ln(n/c) — the
    // information-theoretic repetition signal (CCNet-style compressibility
    // proxy; text08's dup/top fractions are its crude cousins). Each term
    // micro-rounds to an integer BEFORE the per-document sum, so the
    // accumulated entropy is order-free and engine-exact. Same (doc, token)
    // count shape as text08: one shuffle, counts partial-aggregate
    // map-side, the term window is doc-local.
    GraftQuery(
      "text15_token_entropy",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
        val n = sum(col("cnt")).over(Window.partitionBy(col("doc_id")))
        counts
          .withColumn("term_micro",
            round(col("cnt").cast("double") / n
              * log(n.cast("double") / col("cnt")) * 1000000.0).cast("long"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_tokens"),
            sum(col("term_micro")).as("entropy_micro"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS tok FROM documents),
        c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        w AS (SELECT doc_id, cnt,
            CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM c)
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
          CAST(sum(CAST(round(CAST(cnt AS DOUBLE) / n
            * ln(CAST(n AS DOUBLE) / cnt) * 1000000.0e0) AS BIGINT)) AS BIGINT)
            AS entropy_micro
        FROM w GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // fastText-style hashed linear classifier (the CCNet/quality-filter
    // scoring shape): word unigrams feature-hash into 1024 buckets, each
    // bucket carries an integer micro-weight, a document's label is the
    // SIGN of its weight sum. Weights here derive deterministically from
    // the bucket hash (this container ships no trained model); a real
    // model swaps that one expression for a broadcast join against a
    // 1024-row weight table — plan shape otherwise identical. Scale: one
    // corpus scan, explode, two map-side-combinable groupBys (doc, then
    // group); no division anywhere (Spark DIV truncates where DuckDB //
    // floors — sign-of-sum sidesteps the negative-quotient mismatch).
    GraftQuery(
      "text16_hashed_classifier",
      (s, d) => {
        val K = 1024
        val bucket = TA.hash60(col("w")) % K
        val weight =
          (TA.hash60(concat(lit("w:"), bucket.cast("string"))) % 2001) - 1000
        Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), col("lang"), col("source"),
            explode(TA.tokens(col("text"))).as("w"))
          .select(col("doc_id"), col("lang"), col("source"), weight.as("wt"))
          .groupBy(col("doc_id"), col("lang"), col("source"))
          .agg(count(lit(1)).as("n_toks"), sum(col("wt")).as("score_sum"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("score_sum") > 0, lit(1))).as("n_pos"),
            sum(col("n_toks")).as("tok_checksum"),
            sum(col("score_sum")).as("score_checksum"),
            coalesce(sum(when(col("score_sum") > 0, col("doc_id"))), lit(0L))
              .as("id_sum_pos"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, lang, source, unnest(${TA.Sql.tokens("text")}) AS w
          FROM documents),
        b AS (SELECT doc_id, lang, source,
            (${TA.Sql.hash60(s"'w:' || CAST(${TA.Sql.hash60("w")} % 1024 AS VARCHAR)")} % 2001) - 1000 AS wt
          FROM t),
        p AS (SELECT doc_id, lang, source, count(*) AS n_toks,
            CAST(sum(wt) AS BIGINT) AS score_sum
          FROM b GROUP BY 1, 2, 3)
        SELECT lang, source, count(*) AS n_docs,
          count(*) FILTER (score_sum > 0) AS n_pos,
          CAST(sum(n_toks) AS BIGINT) AS tok_checksum,
          CAST(sum(score_sum) AS BIGINT) AS score_checksum,
          coalesce(CAST(sum(doc_id) FILTER (score_sum > 0) AS BIGINT), 0)
            AS id_sum_pos
        FROM p GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // Lexical diversity per document: type-token ratio + Simpson diversity
    // (1 - Σ c² / n²). The entropy-free diversity pair — log() differs in
    // the last ulp across engines, but TTR and Simpson are ratios of exact
    // integer counts divided once, so they are bit-identical. Low diversity
    // (high repetition) is a standard low-quality-document signal alongside
    // text08's verbatim-repetition filters. One groupBy per (doc, token),
    // one per doc — both map-side combinable.
    GraftQuery(
      "text09_lexical_diversity",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("tok"))
        toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(col("c") * col("c")).as("sum_c2"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            (col("n_types") / col("n_tokens")).as("ttr"),
            (lit(1.0) - col("sum_c2") / (col("n_tokens") * col("n_tokens"))).as("simpson"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS tok FROM documents),
          c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
          a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
              CAST(sum(c*c) AS BIGINT) AS sum_c2
            FROM c GROUP BY 1)
        SELECT doc_id, n_tokens, n_types,
          n_types / n_tokens AS ttr,
          1.0 - sum_c2 / (n_tokens * n_tokens) AS simpson
        FROM a"""),
    ),

    // ------------------------------------------------------------------
    // Zipf vocabulary audit: rank the corpus vocabulary by frequency and
    // compare each head term's count against the Zipf prediction
    // f(rank) = f(1)/rank — the vocabulary health check that catches
    // burned-in boilerplate (head terms far ABOVE the curve) and
    // template-duplicated corpora (a flat head, dev_ppm near 0 for many
    // ranks). Scale: one map-side-combinable token count; the ranking
    // runs on the top-10 after a global top-k (vocabulary-sized input,
    // k-sized window). Fully integer: shares and deviations by BIGINT
    // div against the integer prediction.
    GraftQuery(
      "text17_zipf_audit",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(explode(TA.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
          .transform(graft.core.Caches.persist)
        val tot = tf.agg(sum(col("freq")).as("total"))
        // only the top-10 types matter → TakeOrdered (O(k) executor
        // memory), NEVER a global rank window over the full vocabulary
        // (billions of types at 100 TB would sort in ONE task). Rank the
        // k surviving rows with a k-bounded window, per the vocab03
        // exemplar.
        val w = Window.orderBy(col("freq").desc, col("tok").asc)
        val top = tf.orderBy(col("freq").desc, col("tok").asc).limit(10)
          .withColumn("rank", row_number().over(w))
          .crossJoin(broadcast(tot))
        val f1w = Window.partitionBy(lit(1))
        top
          .withColumn("f1", max(when(col("rank") === 1, col("freq"))).over(f1w))
          .select(col("rank"), col("tok"), col("freq"),
            expr("(freq * 1000000) div total").as("share_ppm"),
            expr("f1 div rank").as("zipf_pred"),
            expr("((freq - f1 div rank) * 1000000) div (f1 div rank)").as("dev_ppm"))
      },
      Some(s"""WITH tf AS (SELECT tok, count(*) AS freq
            FROM (SELECT unnest(${TA.Sql.tokens("text")}) AS tok FROM documents)
            WHERE tok <> '' GROUP BY 1),
          tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM tf),
          top AS (SELECT tok, freq,
              row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
            FROM tf QUALIFY rank <= 10),
          f1 AS (SELECT freq AS f1 FROM top WHERE rank = 1)
        SELECT rank, tok, freq,
          (freq * 1000000) // total AS share_ppm,
          f1 // rank AS zipf_pred,
          ((freq - f1 // rank) * 1000000) // (f1 // rank) AS dev_ppm
        FROM top, tot, f1"""),
    ),

    // ------------------------------------------------------------------
    // Unicode NFC normalization (round 13): the canonicalization pass a
    // multilingual corpus runs before dedup/tokenization — visually
    // identical strings with decomposed combining marks (U+0301 etc.)
    // must hash identically. The corpus is ASCII, so decomposed
    // sequences are injected deterministically (every 'a' → 'a'+U+0301)
    // and then NFC-composed back via java.text.Normalizer (the JVM's
    // Unicode implementation) — DuckDB recomputes with its independent
    // nfc_normalize. Per-row map, shuffle-free until the source rollup;
    // hash60 is md5-over-UTF-8 in both engines so the checksum pins the
    // exact composed bytes.
    GraftQuery(
      "text18_nfc_normalize",
      (s, d) => {
        import s.implicits._
        val t2 = Tables.documents(s, d)
          .select(col("source"),
            regexp_replace(col("text"), "a", "a\u0301").as("t2"))
        val nfc = t2.as[(String, String)].map { case (src, v) =>
          (src, v, java.text.Normalizer.normalize(v, java.text.Normalizer.Form.NFC))
        }.toDF("source", "t2", "nf")
        nfc.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(length(col("t2"))).as("pre_chars"),
            sum(length(col("nf"))).as("post_chars"),
            sum(when(col("t2") =!= col("nf"), 1L).otherwise(0L)).as("n_changed"),
            sum(TA.hash60(col("nf")) % TarQueries.M).as("nfc_check"))
      },
      Some(s"""WITH t AS (
          SELECT source, replace(text, 'a', 'a' || chr(769)) AS t2 FROM documents),
        n AS (SELECT source, t2, nfc_normalize(t2) AS nf FROM t)
        SELECT source, count(*) AS n_docs,
          CAST(sum(length(t2)) AS BIGINT) AS pre_chars,
          CAST(sum(length(nf)) AS BIGINT) AS post_chars,
          CAST(count(CASE WHEN t2 <> nf THEN 1 END) AS BIGINT) AS n_changed,
          CAST(sum(${TA.Sql.hash60("nf")} % ${TarQueries.M}) AS BIGINT) AS nfc_check
        FROM n GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Luhn credit-card audit + selective scrub (round 13): the PII class
    // text07's phone pass cannot catch — a 16-digit span is only PII when
    // its Luhn checksum validates (every card number does; ~10% of random
    // digit runs do). Candidates are embedded deterministically per
    // customer, validity is the actual mod-10 double-every-second-digit
    // sum computed identically in both engines, and ONLY validating
    // spans are masked — over-scrubbing order ids and tracking numbers
    // is the classic false-positive this op exists to avoid. Per-row
    // map, shuffle-free.
    GraftQuery(
      "text19_luhn_audit",
      (s, d) => {
        val cand = "lpad(CAST((c_custkey * 2654435761) % 10000000000000000 AS STRING), 16, '0')"
        val luhn = s"""aggregate(transform(sequence(1, 16),
            i -> CASE WHEN i % 2 = 0
              THEN IF(CAST(substring($cand, 17 - i, 1) AS INT) * 2 > 9,
                CAST(substring($cand, 17 - i, 1) AS INT) * 2 - 9,
                CAST(substring($cand, 17 - i, 1) AS INT) * 2)
              ELSE CAST(substring($cand, 17 - i, 1) AS INT) END),
          0, (a, x) -> a + x)"""
        Tables.customer(s, d).select(
          col("c_custkey"),
          expr(s"concat_ws(' ', c_name, $cand, c_mktsegment)").as("txt"),
          expr(s"($luhn) % 10 = 0").as("is_card"))
          .select(
            col("c_custkey"),
            col("is_card").cast("int").as("is_card"),
            md5(when(col("is_card"),
              expr(s"replace(txt, $cand, '<CARD>')")).otherwise(col("txt")))
              .as("scrub_fp"))
      },
      Some("""WITH t AS (SELECT c_custkey, c_name, c_mktsegment,
            lpad(CAST((c_custkey * 2654435761) % 10000000000000000 AS VARCHAR), 16, '0') AS cand
          FROM customer),
        v AS (SELECT c_custkey, cand,
            concat_ws(' ', c_name, cand, c_mktsegment) AS txt,
            list_sum(list_transform(range(1, 17),
              i -> CASE WHEN i % 2 = 0
                THEN CASE WHEN CAST(substring(cand, 17 - i, 1) AS INT) * 2 > 9
                  THEN CAST(substring(cand, 17 - i, 1) AS INT) * 2 - 9
                  ELSE CAST(substring(cand, 17 - i, 1) AS INT) * 2 END
                ELSE CAST(substring(cand, 17 - i, 1) AS INT) END)) % 10 = 0 AS is_card
          FROM t)
        SELECT c_custkey, CAST(is_card AS INT) AS is_card,
          md5(CASE WHEN is_card THEN replace(txt, cand, '<CARD>') ELSE txt END) AS scrub_fp
        FROM v"""),
    ),

    // ------------------------------------------------------------------
    // UTS #39 confusables-skeleton dedup audit (round 15): the Unicode
    // layer beyond text18's NFC — homoglyph spam (Cyrillic а/е/о/р/с,
    // Greek ο/ρ, case tricks) poisons a corpus with visually-identical
    // near-duplicates that hash apart. Three quarters of the docs are
    // deterministically poisoned with script-mixed clones; the dedup key
    // skeleton(NFKC_Casefold(x)) ([[graft.ops.Confusables]], ICU-pinned
    // tables) must collapse every clone back onto its clean form. The
    // oracle replays the key analytically: for printable-ASCII source
    // text the pipeline reduces to lower() plus the seven ASCII
    // confusable prototypes ("→'', %→º/₀, 0→O, 1→l, `→', m→rn, |→l), so
    // DuckDB recomputes keys with no Unicode tables — one wrong mapping
    // anywhere in the 18k-row table path breaks the hash. Per-row scalar
    // map, shuffle-free until the per-source rollup.
    GraftQuery(
      "text20_confusable_skeleton",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .map { case (src, id, text) =>
            val variant = (id % 4) match {
              case 0 => text
              case 1 => text.replace('a', 'а').replace('e', 'е') // cyrillic
              case 2 => text.replace('o', 'ο').replace('p', 'ρ') // greek
              case _ => text.replace('c', 'с') // cyrillic, then case-spam
                .toUpperCase(java.util.Locale.ROOT)
            }
            (src, if (id % 4 == 0) 0L else 1L,
              graft.ops.Confusables.dedupKey(variant))
          }
          .toDF("source", "poisoned", "key")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("poisoned")).as("n_poisoned"),
            countDistinct(col("key")).as("n_keys"),
            sum(length(col("key"))).as("key_chars"),
            sum(TA.hash60(col("key")) % TarQueries.M).as("key_check"))
      },
      Some(s"""WITH k AS (SELECT source, doc_id,
            replace(replace(replace(replace(replace(replace(replace(lower(text),
              '"', chr(39) || chr(39)),
              '%', chr(186) || '/' || chr(8320)),
              '0', 'O'), '1', 'l'), chr(96), chr(39)), 'm', 'rn'), '|', 'l') AS key
          FROM documents)
        SELECT source, count(*) AS n_docs,
          count(CASE WHEN doc_id % 4 != 0 THEN 1 END) AS n_poisoned,
          count(DISTINCT key) AS n_keys,
          CAST(sum(length(key)) AS BIGINT) AS key_chars,
          CAST(sum(${TA.Sql.hash60("key")} % ${TarQueries.M}) AS BIGINT) AS key_check
        FROM k GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Mixed-script audit (round 15 — the OTHER UTS #39 axis next to
    // text20's skeleton): homoglyph spam is detectable BEFORE any
    // confusables table by script mixing — a token whose letters span
    // more than one real script (Common/Inherited never count, §5.1).
    // Docs are deterministically poisoned (every fifth doc class swaps
    // one Latin letter for its Cyrillic or Greek clone), the audit runs
    // the real 952-range ICU-extracted Script table per code point, and
    // the oracle replays token/doc verdicts analytically: under, e.g.,
    // a→а(Cyrl), a token is mixed iff it contains 'a' AND any other
    // Latin letter. Per-row scalar map, shuffle-free until the rollup.
    GraftQuery(
      "text21_script_mix",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .map { case (src, id, text) =>
            val variant = (id % 5) match {
              case 1 => text.replace('a', 'а') // Cyrillic а
              case 2 => text.replace('o', 'ο') // Greek omicron
              case 3 => text.replace('e', 'е') // Cyrillic е
              case _ => text
            }
            val toks = variant.split("\\s+").filter(_.nonEmpty)
            val mixed = toks.count(graft.ops.Confusables.isMixedScript)
            val docScripts = graft.ops.Confusables.scripts(variant)
              .toSeq.sorted.mkString(",")
            (src, toks.length.toLong, mixed.toLong,
              if (mixed > 0) 1L else 0L, docScripts)
          }
          .toDF("source", "n_tokens", "mixed_tokens", "mixed_doc", "scr")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("mixed_tokens")).as("mixed_tokens"),
            sum(col("mixed_doc")).as("mixed_docs"),
            sum(TA.hash60(col("scr")) % TarQueries.M).as("scripts_check"))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH t AS (SELECT source, doc_id, unnest($toks) AS tok FROM documents),
          tk AS (SELECT source, doc_id,
              CASE doc_id % 5
                WHEN 1 THEN tok LIKE '%a%' AND regexp_matches(tok, '[A-Zb-z]')
                WHEN 2 THEN tok LIKE '%o%' AND regexp_matches(tok, '[A-Za-np-z]')
                WHEN 3 THEN tok LIKE '%e%' AND regexp_matches(tok, '[A-Za-df-z]')
                ELSE FALSE END AS mixed
            FROM t WHERE tok <> ''),
          docs AS (SELECT source, doc_id, count(*) AS n_tokens,
              count(CASE WHEN mixed THEN 1 END) AS mixed_tokens
            FROM tk GROUP BY 1, 2),
          scr AS (SELECT source, doc_id,
              CASE doc_id % 5
                WHEN 1 THEN CASE
                  WHEN text LIKE '%a%' AND regexp_matches(text, '[A-Zb-z]')
                    THEN 'Cyrl,Latn'
                  WHEN text LIKE '%a%' THEN 'Cyrl' ELSE 'Latn' END
                WHEN 2 THEN CASE
                  WHEN text LIKE '%o%' AND regexp_matches(text, '[A-Za-np-z]')
                    THEN 'Grek,Latn'
                  WHEN text LIKE '%o%' THEN 'Grek' ELSE 'Latn' END
                WHEN 3 THEN CASE
                  WHEN text LIKE '%e%' AND regexp_matches(text, '[A-Za-df-z]')
                    THEN 'Cyrl,Latn'
                  WHEN text LIKE '%e%' THEN 'Cyrl' ELSE 'Latn' END
                ELSE CASE WHEN regexp_matches(text, '[A-Za-z]')
                  THEN 'Latn' ELSE '' END END AS scr
            FROM documents)
        SELECT d.source, count(*) AS n_docs,
          CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens,
          CAST(sum(d.mixed_tokens) AS BIGINT) AS mixed_tokens,
          CAST(count(CASE WHEN d.mixed_tokens > 0 THEN 1 END) AS BIGINT)
            AS mixed_docs,
          CAST(sum(${TA.Sql.hash60("s.scr")} % ${TarQueries.M}) AS BIGINT)
            AS scripts_check
        FROM docs d JOIN scr s ON d.source = s.source AND d.doc_id = s.doc_id
        GROUP BY 1"""
      },
    ),
  )
}
