package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TOKENIZER / vocabulary operators (BPE training + encode, WordPiece,
  * token coverage, fertility audit), split out of PipelineQueries in
  * round 13 (registry hygiene; query bodies byte-identical).
  */
object VocabQueries {

  /** BPE trainer shared by vocab01 (emits the merge table) and vocab02
    * (encodes the corpus with the final vocabulary): the corpus-scale stage
    * is ONE token-frequency aggregate; the 3 greedy merge iterations then
    * run on the vocabulary-sized word table. Returns (merge rows
    * `it|pair|cnt`, final `token|freq|seq` frame after all merges).
    */

  private def bpeTrain(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val words = Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    bpeTrainWords(words)
  }

  /** the merge loop itself, over any (token, freq) frame — vocab01/02
    * feed whitespace words, vocab08 byte-level pieces
    */
  private def bpeTrainWords(words: DataFrame): (DataFrame, DataFrame) = {
    val s0 = words.withColumn("seq",
      expr("concat(' ', left(regexp_replace(token, '(.)', '$1  '), " +
        "length(regexp_replace(token, '(.)', '$1  ')) - 1))"))
    def pairCounts(sq: DataFrame) = sq
      .select(col("freq"), split(trim(col("seq")), "  ").as("syms"))
      .select(col("freq"), explode(expr(
        // guard: Spark's sequence(1, 0) counts DOWN, so single-symbol
        // sequences must short-circuit to an empty pair list
        "CASE WHEN size(syms) >= 2 THEN transform(sequence(1, size(syms) - 1), " +
          "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1))) " +
          "ELSE array() END")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
    def bestOf(p: DataFrame) =
      p.orderBy(col("cnt").desc, col("pair").asc).limit(1)
    var sq = s0
    var out: DataFrame = null
    for (it <- 1 to 3) {
      val best = bestOf(pairCounts(sq))
      val row = best.select(lit(it).as("it"), col("pair"), col("cnt"))
      out = if (out == null) row else out.unionAll(row)
      sq = sq.crossJoin(broadcast(best.select(col("pair").as("bp"))))
        .withColumn("seq", expr(
          "replace(seq, concat(' ', replace(bp, ' ', '  '), ' '), " +
            "concat(' ', replace(bp, ' ', ''), ' '))"))
        .drop("bp")
    }
    (out, sq)
  }

  /** oracle mirror of [[bpeTrain]]: CTE chain ending at the merge picks
    * b1/b2/b3 and the fully-merged word table s3.
    */
  private lazy val sqlBpeChain: String = raw"""words AS (
          SELECT token, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents)
          WHERE token <> '' GROUP BY 1),
        """ + sqlMergeChain

  /** the merge-chain CTEs (s0..s3, b1..b3) over a preceding `words` CTE */
  private val sqlMergeChain: String = raw"""s0 AS (SELECT token, freq,
            ' ' || left(regexp_replace(token, '(.)', '\1  ', 'g'),
              length(regexp_replace(token, '(.)', '\1  ', 'g')) - 1) AS seq
          FROM words),
        p1 AS (SELECT syms[i] || ' ' || syms[i+1] AS pair,
            CAST(sum(freq) AS BIGINT) AS cnt
          FROM (SELECT freq, string_split(trim(seq), '  ') AS syms FROM s0),
            UNNEST(generate_series(1, len(syms) - 1)) AS g(i) GROUP BY 1),
        b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
        s1 AS (SELECT token, freq, replace(seq,
            ' ' || replace((SELECT pair FROM b1), ' ', '  ') || ' ',
            ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ') AS seq FROM s0),
        p2 AS (SELECT syms[i] || ' ' || syms[i+1] AS pair,
            CAST(sum(freq) AS BIGINT) AS cnt
          FROM (SELECT freq, string_split(trim(seq), '  ') AS syms FROM s1),
            UNNEST(generate_series(1, len(syms) - 1)) AS g(i) GROUP BY 1),
        b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
        s2 AS (SELECT token, freq, replace(seq,
            ' ' || replace((SELECT pair FROM b2), ' ', '  ') || ' ',
            ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ') AS seq FROM s1),
        p3 AS (SELECT syms[i] || ' ' || syms[i+1] AS pair,
            CAST(sum(freq) AS BIGINT) AS cnt
          FROM (SELECT freq, string_split(trim(seq), '  ') AS syms FROM s2),
            UNNEST(generate_series(1, len(syms) - 1)) AS g(i) GROUP BY 1),
        b3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
        s3 AS (SELECT token, freq, replace(seq,
            ' ' || replace((SELECT pair FROM b3), ' ', '  ') || ' ',
            ' ' || replace((SELECT pair FROM b3), ' ', '') || ' ') AS seq FROM s2)"""

  /** byte-level piece frequencies: the GPT-2 front end over the corpus */
  private def bytePieceWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("text")).as[String]
      .flatMap(t => graft.ops.ByteBpe.pieces(t))
      .filter(_.nonEmpty)
      .toDF("token")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
  }

  /** oracle twin of [[bytePieceWords]] — EXACT on this corpus because
    * TESTDATA documents are trimmed single-spaced `[a-z ]` text, where
    * the GPT-2 regex yields the first word bare and every later word
    * with a leading space (→ `Ġ` through bytes_to_unicode). Full-charset
    * fidelity (contractions, digits, punctuation, unicode, emoji) is
    * pinned separately by ByteBpeSpec against the python regex engine.
    */
  private val sqlBytePieceWords: String = raw"""arrs AS (
          SELECT regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
        words AS (
          SELECT token, count(*) AS freq FROM (
            SELECT CASE WHEN i = 1 THEN a[i] ELSE 'Ġ' || a[i] END AS token
            FROM arrs, UNNEST(generate_series(1, len(a))) AS g(i))
          WHERE token <> '' AND token <> 'Ġ' GROUP BY 1)"""

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // BPE tokenizer training (3 merge iterations): the corpus-scale stage
    // is ONE token-frequency aggregate (at 100 TB that is the heavy job;
    // everything after runs on the vocabulary-sized word table). Each
    // iteration counts weighted adjacent symbol pairs, picks the best merge
    // (count desc, pair asc — total order), and applies it with a plain
    // string replace over double-space-joined symbol sequences: the two-
    // space separator makes the padded pattern ' a  b ' boundary-safe (a
    // symbol's tail can never false-match) while consecutive occurrences
    // still merge left-to-right, which is exactly greedy BPE application.
    // Every step is integer counts + deterministic string surgery — the
    // DuckDB oracle reproduces the trainer bit-for-bit.
    GraftQuery(
      "vocab01_bpe_merges",
      (s, d) => bpeTrain(s, d)._1,
      Some(s"""WITH $sqlBpeChain
        SELECT 1 AS it, pair, cnt FROM b1
        UNION ALL SELECT 2, pair, cnt FROM b2
        UNION ALL SELECT 3, pair, cnt FROM b3"""),
    ),

    // ------------------------------------------------------------------
    // BPE corpus encoding (the apply side of vocab01's trainer): every
    // token's post-merge symbol count comes from the vocabulary table, so
    // the corpus-scale stage is explode-tokens + ONE broadcast join against
    // the vocabulary (always dimension-sized — it grows with distinct
    // tokens, not corpus bytes) + a doc_id-keyed count/sum that partial-
    // aggregates map-side. The compression signal (n_tokens vs n_symbols)
    // is what a tokenizer-fertility audit reads per document at 100 TB.
    GraftQuery(
      "vocab02_bpe_encode",
      (s, d) => {
        val vocab = bpeTrain(s, d)._2
          .select(col("token"), size(split(trim(col("seq")), "  ")).as("n_syms"))
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("token"))
          .filter(col("token") =!= "")
        toks.join(broadcast(vocab), "token")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("n_syms")).as("n_symbols"))
      },
      Some(raw"""WITH $sqlBpeChain,
        vocab AS (SELECT token, len(string_split(trim(seq), '  ')) AS n_syms FROM s3),
        toks AS (SELECT doc_id,
            unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(v.n_syms) AS BIGINT) AS n_symbols
        FROM toks t JOIN vocab v ON t.token = v.token
        WHERE t.token <> '' GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Byte-level BPE training (round 16 — the GPT-2/tiktoken front end
    // production tokenizers actually use, vs vocab01's word-level toy):
    // the corpus runs through the REAL GPT-2 pretokenizer regex and the
    // published 256-entry byte-to-unicode table ([[graft.ops.ByteBpe]],
    // python-regex-pinned by ByteBpeSpec), then the same 3-iteration
    // greedy merge loop as vocab01 over piece frequencies — so merges
    // learn across word boundaries the way GPT-2's do (`Ġ` carries the
    // preceding space INTO the token). Corpus-scale stage is ONE
    // piece-frequency aggregate; merges run on the vocabulary-sized
    // table. DuckDB replays the pieces (exact on this corpus — see
    // sqlBytePieceWords) and the full merge chain bit-for-bit.
    GraftQuery(
      "vocab08_bytebpe_merges",
      // Round 18 A/B: persisting the piece-frequency table (so the merge
      // loop's 3 best-pair jobs skip the corpus pretokenizer re-run) was
      // measured SLOWER here — isolated warm 1.6 → 2.3 s: at this SF the
      // 1–3-task corpus flatMap is cheaper than a 32-partition cache
      // round-trip per merge job — so the trainer-only query stays
      // unpersisted (the r17 vocab01/02 finding repeats). vocab09, whose
      // encode side reuses the same stream, keeps the persist.
      (s, d) => bpeTrainWords(bytePieceWords(s, d))._1,
      Some(raw"""WITH $sqlBytePieceWords,
        $sqlMergeChain
        SELECT 1 AS it, pair, cnt FROM b1
        UNION ALL SELECT 2, pair, cnt FROM b2
        UNION ALL SELECT 3, pair, cnt FROM b3"""),
    ),

    // ------------------------------------------------------------------
    // Byte-level BPE corpus encoding (the apply side of vocab08, like
    // vocab02 for vocab01): per-document piece and post-merge symbol
    // counts through ONE broadcast join against the trained vocabulary.
    // The Ġ-aware fertility (symbols per byte piece) is the number a
    // real tokenizer build reads.
    GraftQuery(
      "vocab09_bytebpe_encode",
      (s, d) => {
        import s.implicits._
        // Round 18 A/B: persisting the trainer's piece-frequency table was
        // isolated-neutral but measured +0.5 s in the full-suite context
        // (cache churn across 300+ queries) — reverted, matching vocab08's
        // finding; the 1–3-task corpus flatMap per merge job is the cheaper
        // local trade, and at scale the re-runs are linear scans, not
        // shuffles.
        val vocab = bpeTrainWords(bytePieceWords(s, d))._2
          .select(col("token"), size(split(trim(col("seq")), "  ")).as("n_syms"))
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .transform(graft.core.Par.spread)
          .as[(Long, String)]
          .flatMap { case (id, t) => graft.ops.ByteBpe.pieces(t).map((id, _)) }
          .toDF("doc_id", "token")
          .filter(col("token") =!= "")
        toks.join(broadcast(vocab), "token")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_pieces"), sum(col("n_syms")).as("n_symbols"))
      },
      Some(raw"""WITH $sqlBytePieceWords,
        $sqlMergeChain,
        vocab AS (SELECT token, len(string_split(trim(seq), '  ')) AS n_syms FROM s3),
        darrs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
          FROM documents),
        dtoks AS (SELECT doc_id,
            CASE WHEN i = 1 THEN a[i] ELSE 'Ġ' || a[i] END AS token
          FROM darrs, UNNEST(generate_series(1, len(a))) AS g(i))
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_pieces,
          CAST(sum(v.n_syms) AS BIGINT) AS n_symbols
        FROM dtoks t JOIN vocab v ON t.token = v.token
        WHERE t.token <> '' GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Vocabulary-coverage planning (the OOV-rate table a tokenizer build
    // reads to pick its vocab size): corpus token frequencies ranked by
    // (freq desc, token asc), then the share of ALL token occurrences
    // covered by the top-100/500/1000 types. One explode + one
    // map-side-combinable frequency groupBy; the ranked relation is
    // vocabulary-sized (types, not occurrences), so the rank window and
    // the final single-row aggregate are negligible at any corpus scale.
    GraftQuery(
      "vocab03_token_coverage",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(explode(TA.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .transform(graft.core.Caches.persist)
        // only the top-1000 types matter for coverage → TakeOrdered (O(k)
        // executor memory), NEVER a global rank window over the vocabulary
        val top = freq.orderBy(col("n").desc, col("tok").asc).limit(1000)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("n").desc, col("tok").asc)))
          .agg(
            sum(when(col("rnk") <= 100, col("n")).otherwise(0L)).as("cov100"),
            sum(when(col("rnk") <= 500, col("n")).otherwise(0L)).as("cov500"),
            sum(col("n")).as("cov1000"))
        val tot = freq.agg(sum(col("n")).as("total_tokens"),
          count(lit(1)).as("n_types"))
        tot.crossJoin(broadcast(top))
          .select(col("total_tokens"), col("n_types"),
            round(col("cov100") * 1000000.0 / col("total_tokens")).cast("long")
              .as("cov100_ppm"),
            round(col("cov500") * 1000000.0 / col("total_tokens")).cast("long")
              .as("cov500_ppm"),
            round(col("cov1000") * 1000000.0 / col("total_tokens")).cast("long")
              .as("cov1000_ppm"))
      },
      Some(s"""WITH f AS (SELECT tok, count(*) AS n FROM
            (SELECT unnest(${TA.Sql.tokens("text")}) AS tok FROM documents)
            GROUP BY 1),
          r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk FROM f)
        SELECT CAST(sum(n) AS BIGINT) AS total_tokens, count(*) AS n_types,
          CAST(round(sum(CASE WHEN rnk <= 100 THEN n ELSE 0 END)
            * 1000000.0e0 / sum(n)) AS BIGINT) AS cov100_ppm,
          CAST(round(sum(CASE WHEN rnk <= 500 THEN n ELSE 0 END)
            * 1000000.0e0 / sum(n)) AS BIGINT) AS cov500_ppm,
          CAST(round(sum(CASE WHEN rnk <= 1000 THEN n ELSE 0 END)
            * 1000000.0e0 / sum(n)) AS BIGINT) AS cov1000_ppm
        FROM r"""),
    ),

    // ------------------------------------------------------------------
    // WordPiece tokenizer train + encode ([[graft.ops.WordPiece]]; the
    // BERT tokenizer's greedy longest-match-first algorithm with `##`
    // continuation marks, completing the tokenizer family next to BPE's
    // vocab01/vocab02). Training: every marked substring occurrence
    // (length ≤ 4) of every DISTINCT word, weighted by the word's corpus
    // count, thresholded at total_tokens/500 occurrences. Encoding: the
    // reference greedy — longest vocabulary piece at each position,
    // whole-word [UNK] on any miss. Both run on the distinct-word table;
    // the corpus contributes ONE map-side-combinable word count and one
    // broadcast join back, so at 100 TB this is scan + word-table work.
    // The oracle replays the greedy loop as a recursive CTE over a
    // precomputed (word, pos) -> longest-match table; seg_check pins the
    // piece count of every individual word, not just the totals.
    GraftQuery(
      "vocab04_wordpiece",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(col("lang"), col("source"),
            explode(TA.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val wcDf = graft.core.Caches.persist(
          toks.groupBy(col("w")).agg(count(lit(1)).as("n")))
        val wcDs = wcDf.as[(String, Long)]
        val totalTokens = wcDf.agg(sum(col("n"))).head.getLong(0)
        val thresh = totalTokens / 500
        val pieceSet = wcDs
          .flatMap { case (w, n) =>
            graft.ops.WordPiece.substrings(w).map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("cnt"))
          .filter(col("cnt") >= thresh)
          .select(col("piece")).as[String].collect().toSet
        val bc = s.sparkContext.broadcast(pieceSet)
        val seg = wcDs.map { case (w, _) =>
            val (np, unk) = graft.ops.WordPiece.encode(w, bc.value)
            (w, np, unk) }
          .toDF("w", "np", "unk")
        toks.join(broadcast(seg), "w")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("np")).as("piece_sum"),
            sum(col("unk")).as("unk_words"),
            sum(col("np") * (TA.hash60(col("w")) % 1000L)).as("seg_check"))
          .withColumn("vocab_size", lit(pieceSet.size.toLong))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH toksr AS (SELECT lang, source, unnest($toks) AS w FROM documents),
          toks AS (SELECT * FROM toksr WHERE w <> ''),
          tot AS (SELECT count(*) AS n_tok FROM toks),
          wc AS (SELECT w, count(*) AS n FROM toks GROUP BY 1),
          sube AS (SELECT w, n, i, L,
              CASE WHEN i = 1 THEN substr(w, i, L)
                ELSE '##' || substr(w, i, L) END AS piece
            FROM (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
                 (SELECT unnest(range(1, 5)) AS L)
            WHERE i + L - 1 <= length(w)),
          pieces AS (SELECT piece FROM sube GROUP BY 1
            HAVING sum(n) >= (SELECT n_tok // 500 FROM tot)),
          bm AS (SELECT s.w, s.i AS pos, max(s.L) AS step
            FROM sube s JOIN pieces p ON s.piece = p.piece GROUP BY 1, 2),
          st AS (
            WITH RECURSIVE r(w, pos, np, unk) AS (
              SELECT w, 1, 0, 0 FROM wc
              UNION ALL
              SELECT r.w,
                CASE WHEN bm.step IS NULL THEN length(r.w)+1
                  ELSE r.pos + bm.step END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE r.np + 1 END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE r.unk END
              FROM r LEFT JOIN bm ON r.w = bm.w AND r.pos = bm.pos
              WHERE r.pos <= length(r.w) AND r.unk = 0)
            SELECT w, np, unk FROM r WHERE pos > length(w) OR unk = 1),
          seg AS (SELECT w, CASE WHEN unk = 1 THEN 1 ELSE np END AS np, unk
            FROM st)
        SELECT lang, source, count(*) AS n_words,
          CAST(sum(np) AS BIGINT) AS piece_sum,
          CAST(sum(unk) AS BIGINT) AS unk_words,
          CAST(sum(np * (${TA.Sql.hash60("t.w")} % 1000)) AS BIGINT) AS seg_check,
          (SELECT count(*) FROM pieces) AS vocab_size
        FROM toks t JOIN seg USING (w) GROUP BY 1, 2"""
      },
    ),

    // ------------------------------------------------------------------
    // Tokenizer fertility audit — the comparison table a tokenizer
    // SELECTION actually reads: both trained tokenizers (vocab01's BPE
    // after its 3 merges; vocab04's WordPiece inventory + greedy encode)
    // run over the same corpus, reported per language as pieces-per-word
    // and chars-per-piece in exact rounded ppm. Both per-word tables are
    // vocabulary-sized and BROADCAST; the corpus contributes one token
    // explode and one lang-sized groupBy, so the audit is scan-rate at
    // any corpus size. The oracle replays BOTH training chains (the BPE
    // merge CTEs and the WordPiece recursive greedy) and must agree on
    // every per-lang integer before the single rounded divisions.
    GraftQuery(
      "vocab05_fertility",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TA.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val wcDf = graft.core.Caches.persist(
          toks.groupBy(col("w")).agg(count(lit(1)).as("n")))
        // Round 18 (VERDICT r17 item 6): the BPE trainer's word-frequency
        // input IS wcDf — bpeTrain(s, d) recomputed the same corpus explode
        // + groupBy from scratch (and the 3-round merge loop re-executed
        // that subtree once per `best` pick). Feeding the ALREADY-PERSISTED
        // word table removes one corpus scan per merge-loop job. Exact
        // equivalence: bpeTrain's words = documents → explode(tokens) →
        // filter('' ≠ w) → groupBy(token).count — the same multiset of
        // tokens wcDf aggregates (the extra `lang` projection changes no
        // rows), so (token, freq) ≡ (w, n) row for row.
        val bpe = bpeTrainWords(
          wcDf.select(col("w").as("token"), col("n").as("freq")))._2
          .select(col("token").as("w"),
            size(split(trim(col("seq")), "  ")).as("bpe_syms"))
        val wcDs = wcDf.as[(String, Long)]
        val thresh = wcDf.agg(sum(col("n"))).head.getLong(0) / 500
        val pieceSet = wcDs
          .flatMap { case (w, n) =>
            graft.ops.WordPiece.substrings(w).map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("cnt"))
          .filter(col("cnt") >= thresh)
          .select(col("piece")).as[String].collect().toSet
        val bc = s.sparkContext.broadcast(pieceSet)
        val seg = wcDs.map { case (w, _) =>
            (w, graft.ops.WordPiece.encode(w, bc.value)._1) }
          .toDF("w", "wp_pieces")
        toks.join(broadcast(seg), "w").join(broadcast(bpe), "w")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("bpe_syms")).as("bpe_syms"),
            sum(col("wp_pieces")).as("wp_pieces"),
            sum(length(col("w"))).as("char_sum"))
          .select(col("lang"), col("n_words"), col("bpe_syms"),
            col("wp_pieces"), col("char_sum"),
            round(lit(1e6) * col("bpe_syms") / col("n_words")).cast("long")
              .as("bpe_ppw_ppm"),
            round(lit(1e6) * col("wp_pieces") / col("n_words")).cast("long")
              .as("wp_ppw_ppm"),
            round(lit(1e6) * col("char_sum") / col("wp_pieces")).cast("long")
              .as("chars_per_wp_ppm"))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH $sqlBpeChain,
          bpe AS (SELECT token AS w,
              len(string_split(trim(seq), '  ')) AS bpe_syms FROM s3),
          toksr AS (SELECT lang, unnest($toks) AS w FROM documents),
          ctoks AS (SELECT * FROM toksr WHERE w <> ''),
          tot AS (SELECT count(*) AS n_tok FROM ctoks),
          wc AS (SELECT w, count(*) AS n FROM ctoks GROUP BY 1),
          sube AS (SELECT w, n, i, L,
              CASE WHEN i = 1 THEN substr(w, i, L)
                ELSE '##' || substr(w, i, L) END AS piece
            FROM (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
                 (SELECT unnest(range(1, 5)) AS L)
            WHERE i + L - 1 <= length(w)),
          pieces AS (SELECT piece FROM sube GROUP BY 1
            HAVING sum(n) >= (SELECT n_tok // 500 FROM tot)),
          bm AS (SELECT s.w, s.i AS pos, max(s.L) AS step
            FROM sube s JOIN pieces p ON s.piece = p.piece GROUP BY 1, 2),
          st AS (
            WITH RECURSIVE r(w, pos, np, unk) AS (
              SELECT w, 1, 0, 0 FROM wc
              UNION ALL
              SELECT r.w,
                CASE WHEN bm.step IS NULL THEN length(r.w)+1
                  ELSE r.pos + bm.step END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE r.np + 1 END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE r.unk END
              FROM r LEFT JOIN bm ON r.w = bm.w AND r.pos = bm.pos
              WHERE r.pos <= length(r.w) AND r.unk = 0)
            SELECT w, np, unk FROM r WHERE pos > length(w) OR unk = 1),
          seg AS (SELECT w, CASE WHEN unk = 1 THEN 1 ELSE np END AS wp_pieces
            FROM st),
          g AS (SELECT lang, count(*) AS n_words,
              CAST(sum(bpe_syms) AS BIGINT) AS bpe_syms,
              CAST(sum(wp_pieces) AS BIGINT) AS wp_pieces,
              CAST(sum(length(t.w)) AS BIGINT) AS char_sum
            FROM ctoks t JOIN seg USING (w) JOIN bpe USING (w) GROUP BY 1)
        SELECT lang, n_words, bpe_syms, wp_pieces, char_sum,
          CAST(round(1e6 * bpe_syms / n_words) AS BIGINT) AS bpe_ppw_ppm,
          CAST(round(1e6 * wp_pieces / n_words) AS BIGINT) AS wp_ppw_ppm,
          CAST(round(1e6 * char_sum / wp_pieces) AS BIGINT) AS chars_per_wp_ppm
        FROM g"""
      },
    ),

    // ------------------------------------------------------------------
    // Unigram-LM (SentencePiece-style) tokenizer training (round 15 —
    // [[graft.ops.UnigramLm]]; completes the trio after BPE and
    // WordPiece). Deterministic re-specification of Kudo 2018: seed vocab
    // = substrings (≤4) of distinct words thresholded at total/500 plus
    // all single chars (coverage); INTEGER log2 costs (bits(total) −
    // bits(cnt) — no float log-likelihoods for engines to disagree on);
    // exact Viterbi by (Σcost, pieces, path) where the lexicographic
    // path tie-break makes the chosen segmentation itself deterministic;
    // ONE hard-EM round (usage recount over chosen paths → prune unused
    // pieces → re-derive costs → final inference). The oracle replays
    // both Viterbi rounds as recursive path-enumeration CTEs picked by
    // the same (cost, np, path) order. Scale: the corpus contributes one
    // map-combinable token count and one broadcast join back; ALL
    // training runs on the vocabulary-sized distinct-word table (the
    // vocab04 contract).
    GraftQuery(
      "vocab06_unigram_lm",
      (s, d) => {
        import s.implicits._
        import graft.ops.UnigramLm
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TA.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val wcDf = graft.core.Caches.persist(
          toks.groupBy(col("w")).agg(count(lit(1)).as("n")))
        val wcDs = wcDf.as[(String, Long)]
        val tot = wcDf.agg(sum(col("n"))).head.getLong(0)
        val thresh = tot / 500
        // threshold pushed INTO the frame so only surviving pieces ever
        // reach the driver (round-16 hygiene; the sibling WordPiece legs
        // already did this)
        val seedCnt = wcDs
          .flatMap { case (w, n) => UnigramLm.substrings(w).map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("cnt"))
          .filter(col("cnt") >= thresh || length(col("piece")) === 1)
          .as[(String, Long)].collect()
        val cost0 = seedCnt.iterator
          .map { case (p, c) => p -> (UnigramLm.bits(tot) - UnigramLm.bits(c)) }
          .toMap
        val bc0 = s.sparkContext.broadcast(cost0)
        val seg1 = wcDs.map { case (w, n) =>
          (w, n, UnigramLm.segment(w, bc0.value)
            .getOrElse(sys.error(s"uncoverable word $w"))._3)
        }
        val usage = seg1
          .flatMap { case (_, n, path) => path.split(' ').map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("u"))
          .as[(String, Long)].collect()
        val totU = usage.iterator.map(_._2).sum
        val cost1 = usage.iterator
          .map { case (p, u) => p -> (UnigramLm.bits(totU) - UnigramLm.bits(u)) }
          .toMap
        val bc1 = s.sparkContext.broadcast(cost1)
        val seg2 = wcDs.map { case (w, _) =>
            val (c, np, _) = UnigramLm.segment(w, bc1.value)
              .getOrElse(sys.error(s"word $w lost coverage after pruning"))
            (w, c, np.toLong)
          }.toDF("w", "vcost", "np")
        toks.join(broadcast(seg2), "w")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_words"),
            sum(col("np")).as("piece_sum"),
            sum(col("vcost")).as("cost_sum"),
            sum(col("np") * (TA.hash60(col("w")) % 1000L)).as("seg_check"))
          .select(col("lang"), col("n_words"), col("piece_sum"),
            col("cost_sum"), col("seg_check"),
            round(lit(1e6) * col("piece_sum") / col("n_words")).cast("long")
              .as("fert_ppm"),
            lit(cost0.size.toLong).as("vocab_seed"),
            lit(cost1.size.toLong).as("vocab_pruned"))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH toksr AS (SELECT lang, unnest($toks) AS w FROM documents),
          ctoks AS (SELECT * FROM toksr WHERE w <> ''),
          tot AS (SELECT count(*) AS n_tok FROM ctoks),
          wc AS (SELECT w, count(*) AS n FROM ctoks GROUP BY 1),
          sube AS (SELECT substr(w, i, L) AS piece, n
            FROM (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
                 (SELECT unnest(range(1, 5)) AS L)
            WHERE i + L - 1 <= length(w)),
          pc AS (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM sube GROUP BY 1),
          cost0 AS (SELECT piece,
              length(printf('%b', (SELECT n_tok FROM tot)))
                - length(printf('%b', cnt)) AS c
            FROM pc WHERE cnt >= (SELECT n_tok // 500 FROM tot)
              OR length(piece) = 1),
          b1 AS (
            WITH RECURSIVE r(w, pos, cost, np, path) AS (
              SELECT w, 0, 0, 0, '' FROM wc
              UNION ALL
              SELECT r.w, r.pos + length(c0.piece), r.cost + c0.c, r.np + 1,
                CASE WHEN r.path = '' THEN c0.piece
                  ELSE r.path || ' ' || c0.piece END
              FROM r JOIN cost0 c0
                ON substr(r.w, r.pos + 1, length(c0.piece)) = c0.piece
              WHERE r.pos < length(r.w))
            SELECT w, path FROM (
              SELECT w, path, row_number() OVER (
                PARTITION BY w ORDER BY cost, np, path) AS rn
              FROM r WHERE pos = length(w)) WHERE rn = 1),
          usage AS (SELECT piece, CAST(sum(n) AS BIGINT) AS u
            FROM (SELECT w, unnest(string_split(path, ' ')) AS piece FROM b1)
            JOIN wc USING (w) GROUP BY 1),
          totu AS (SELECT CAST(sum(u) AS BIGINT) AS tu FROM usage),
          cost1 AS (SELECT piece,
              length(printf('%b', (SELECT tu FROM totu)))
                - length(printf('%b', u)) AS c
            FROM usage),
          b2 AS (
            -- r2, not r: DuckDB resolves a second nested WITH RECURSIVE r
            -- to the FIRST one's rows (b1's), yielding an empty result
            WITH RECURSIVE r2(w, pos, cost, np, path) AS (
              SELECT w, 0, 0, 0, '' FROM wc
              UNION ALL
              SELECT r2.w, r2.pos + length(c1.piece), r2.cost + c1.c, r2.np + 1,
                CASE WHEN r2.path = '' THEN c1.piece
                  ELSE r2.path || ' ' || c1.piece END
              FROM r2 JOIN cost1 c1
                ON substr(r2.w, r2.pos + 1, length(c1.piece)) = c1.piece
              WHERE r2.pos < length(r2.w))
            SELECT w, cost AS vcost, np FROM (
              SELECT w, cost, np, row_number() OVER (
                PARTITION BY w ORDER BY cost, np, path) AS rn
              FROM r2 WHERE pos = length(w)) WHERE rn = 1)
        SELECT lang, count(*) AS n_words,
          CAST(sum(np) AS BIGINT) AS piece_sum,
          CAST(sum(vcost) AS BIGINT) AS cost_sum,
          CAST(sum(np * (${TA.Sql.hash60("t.w")} % 1000)) AS BIGINT) AS seg_check,
          CAST(round(1e6 * sum(np) / count(*)) AS BIGINT) AS fert_ppm,
          (SELECT count(*) FROM cost0) AS vocab_seed,
          (SELECT count(*) FROM cost1) AS vocab_pruned
        FROM ctoks t JOIN b2 USING (w) GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Three-tokenizer fertility table (round 15 — vocab05 extended with
    // the unigram leg): the comparison a tokenizer SELECTION reads, all
    // three trained tokenizers (vocab01's BPE after 3 merges, vocab04's
    // WordPiece inventory + greedy encode, vocab06's unigram after its
    // hard-EM round) over the same corpus, per language, in exact
    // rounded ppm. All three per-word tables are vocabulary-sized and
    // broadcast; the corpus contributes ONE token explode. The oracle
    // replays ALL THREE training chains (BPE merge CTEs, the WordPiece
    // recursive greedy, both unigram Viterbi enumerations) and must
    // agree on every per-lang integer.
    GraftQuery(
      "vocab07_tokenizer_tri",
      (s, d) => {
        import s.implicits._
        import graft.ops.UnigramLm
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TA.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val wcDf = graft.core.Caches.persist(
          toks.groupBy(col("w")).agg(count(lit(1)).as("n")))
        // Round 18 (VERDICT r17 item 6): the BPE leg trains on the persisted
        // word table instead of re-scanning the corpus — see vocab05 for the
        // row-for-row equivalence argument (same explode/filter/groupBy).
        val bpe = bpeTrainWords(
          wcDf.select(col("w").as("token"), col("n").as("freq")))._2
          .select(col("token").as("w"),
            size(split(trim(col("seq")), "  ")).as("bpe_syms"))
        val wcDs = wcDf.as[(String, Long)]
        val tot = wcDf.agg(sum(col("n"))).head.getLong(0)
        val thresh = tot / 500
        // WordPiece leg (the vocab04 trainer)
        val pieceSet = wcDs
          .flatMap { case (w, n) =>
            graft.ops.WordPiece.substrings(w).map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("cnt"))
          .filter(col("cnt") >= thresh)
          .select(col("piece")).as[String].collect().toSet
        val bcWp = s.sparkContext.broadcast(pieceSet)
        // Unigram leg (the vocab06 trainer: seed -> Viterbi -> recount)
        val seedCnt = wcDs
          .flatMap { case (w, n) => UnigramLm.substrings(w).map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("cnt"))
          .filter(col("cnt") >= thresh || length(col("piece")) === 1)
          .as[(String, Long)].collect()
        val cost0 = seedCnt.iterator
          .map { case (p, c) => p -> (UnigramLm.bits(tot) - UnigramLm.bits(c)) }
          .toMap
        val bc0 = s.sparkContext.broadcast(cost0)
        val usage = wcDs.map { case (w, n) =>
            (n, UnigramLm.segment(w, bc0.value).get._3) }
          .flatMap { case (n, path) => path.split(' ').map(p => (p, n)) }
          .toDF("piece", "pn")
          .groupBy(col("piece")).agg(sum(col("pn")).as("u"))
          .as[(String, Long)].collect()
        val totU = usage.iterator.map(_._2).sum
        val cost1 = usage.iterator
          .map { case (p, u) => p -> (UnigramLm.bits(totU) - UnigramLm.bits(u)) }
          .toMap
        val bc1 = s.sparkContext.broadcast(cost1)
        val seg = wcDs.map { case (w, _) =>
            val (wpN, _) = graft.ops.WordPiece.encode(w, bcWp.value)
            val uniN = UnigramLm.segment(w, bc1.value).get._2
            (w, wpN, uniN.toLong)
          }.toDF("w", "wp_pieces", "uni_pieces")
        toks.join(broadcast(seg), "w").join(broadcast(bpe), "w")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("bpe_syms")).as("bpe_syms"),
            sum(col("wp_pieces")).as("wp_pieces"),
            sum(col("uni_pieces")).as("uni_pieces"))
          .select(col("lang"), col("n_words"), col("bpe_syms"),
            col("wp_pieces"), col("uni_pieces"),
            round(lit(1e6) * col("bpe_syms") / col("n_words")).cast("long")
              .as("bpe_ppw_ppm"),
            round(lit(1e6) * col("wp_pieces") / col("n_words")).cast("long")
              .as("wp_ppw_ppm"),
            round(lit(1e6) * col("uni_pieces") / col("n_words")).cast("long")
              .as("uni_ppw_ppm"))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH $sqlBpeChain,
          bpe AS (SELECT token AS w,
              len(string_split(trim(seq), '  ')) AS bpe_syms FROM s3),
          toksr AS (SELECT lang, unnest($toks) AS w FROM documents),
          ctoks AS (SELECT * FROM toksr WHERE w <> ''),
          tot AS (SELECT count(*) AS n_tok FROM ctoks),
          wc AS (SELECT w, count(*) AS n FROM ctoks GROUP BY 1),
          subw AS (SELECT w, n, i, L,
              CASE WHEN i = 1 THEN substr(w, i, L)
                ELSE '##' || substr(w, i, L) END AS piece
            FROM (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
                 (SELECT unnest(range(1, 5)) AS L)
            WHERE i + L - 1 <= length(w)),
          wpieces AS (SELECT piece FROM subw GROUP BY 1
            HAVING sum(n) >= (SELECT n_tok // 500 FROM tot)),
          bm AS (SELECT s.w, s.i AS pos, max(s.L) AS step
            FROM subw s JOIN wpieces p ON s.piece = p.piece GROUP BY 1, 2),
          st AS (
            WITH RECURSIVE rg(w, pos, np, unk) AS (
              SELECT w, 1, 0, 0 FROM wc
              UNION ALL
              SELECT rg.w,
                CASE WHEN bm.step IS NULL THEN length(rg.w)+1
                  ELSE rg.pos + bm.step END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE rg.np + 1 END,
                CASE WHEN bm.step IS NULL THEN 1 ELSE rg.unk END
              FROM rg LEFT JOIN bm ON rg.w = bm.w AND rg.pos = bm.pos
              WHERE rg.pos <= length(rg.w) AND rg.unk = 0)
            SELECT w, np, unk FROM rg WHERE pos > length(w) OR unk = 1),
          wpseg AS (SELECT w, CASE WHEN unk = 1 THEN 1 ELSE np END AS wp_pieces
            FROM st),
          subu AS (SELECT substr(w, i, L) AS piece, n
            FROM (SELECT w, n, unnest(range(1, length(w)+1)) AS i FROM wc),
                 (SELECT unnest(range(1, 5)) AS L)
            WHERE i + L - 1 <= length(w)),
          upc AS (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM subu GROUP BY 1),
          cost0 AS (SELECT piece,
              length(printf('%b', (SELECT n_tok FROM tot)))
                - length(printf('%b', cnt)) AS c
            FROM upc WHERE cnt >= (SELECT n_tok // 500 FROM tot)
              OR length(piece) = 1),
          ub1 AS (
            WITH RECURSIVE r1(w, pos, cost, np, path) AS (
              SELECT w, 0, 0, 0, '' FROM wc
              UNION ALL
              SELECT r1.w, r1.pos + length(c0.piece), r1.cost + c0.c, r1.np + 1,
                CASE WHEN r1.path = '' THEN c0.piece
                  ELSE r1.path || ' ' || c0.piece END
              FROM r1 JOIN cost0 c0
                ON substr(r1.w, r1.pos + 1, length(c0.piece)) = c0.piece
              WHERE r1.pos < length(r1.w))
            SELECT w, path FROM (
              SELECT w, path, row_number() OVER (
                PARTITION BY w ORDER BY cost, np, path) AS rn
              FROM r1 WHERE pos = length(w)) WHERE rn = 1),
          uusage AS (SELECT piece, CAST(sum(n) AS BIGINT) AS u
            FROM (SELECT w, unnest(string_split(path, ' ')) AS piece FROM ub1)
            JOIN wc USING (w) GROUP BY 1),
          totu AS (SELECT CAST(sum(u) AS BIGINT) AS tu FROM uusage),
          cost1 AS (SELECT piece,
              length(printf('%b', (SELECT tu FROM totu)))
                - length(printf('%b', u)) AS c
            FROM uusage),
          ub2 AS (
            WITH RECURSIVE r2(w, pos, cost, np, path) AS (
              SELECT w, 0, 0, 0, '' FROM wc
              UNION ALL
              SELECT r2.w, r2.pos + length(c1.piece), r2.cost + c1.c, r2.np + 1,
                CASE WHEN r2.path = '' THEN c1.piece
                  ELSE r2.path || ' ' || c1.piece END
              FROM r2 JOIN cost1 c1
                ON substr(r2.w, r2.pos + 1, length(c1.piece)) = c1.piece
              WHERE r2.pos < length(r2.w))
            SELECT w, np AS uni_pieces FROM (
              SELECT w, np, row_number() OVER (
                PARTITION BY w ORDER BY cost, np, path) AS rn
              FROM r2 WHERE pos = length(w)) WHERE rn = 1),
          g AS (SELECT lang, count(*) AS n_words,
              CAST(sum(bpe_syms) AS BIGINT) AS bpe_syms,
              CAST(sum(wp_pieces) AS BIGINT) AS wp_pieces,
              CAST(sum(uni_pieces) AS BIGINT) AS uni_pieces
            FROM ctoks t JOIN wpseg USING (w) JOIN ub2 USING (w)
              JOIN bpe USING (w)
            GROUP BY 1)
        SELECT lang, n_words, bpe_syms, wp_pieces, uni_pieces,
          CAST(round(1e6 * bpe_syms / n_words) AS BIGINT) AS bpe_ppw_ppm,
          CAST(round(1e6 * wp_pieces / n_words) AS BIGINT) AS wp_ppw_ppm,
          CAST(round(1e6 * uni_pieces / n_words) AS BIGINT) AS uni_ppw_ppm
        FROM g"""
      },
    ),
  )
}
