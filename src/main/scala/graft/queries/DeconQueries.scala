package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Dedup, Similarity, Sketches, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DECONTAMINATION and curation operators, split out of CorpusQueries in
  * round 13 (registry hygiene; query bodies byte-identical): eval-set
  * n-gram overlap and scrubbing (decon01-04), Gopher-rule and DSIR
  * curation (curate01-02), and the composed training-shard prep pipeline
  * (pipe03).
  */
object DeconQueries {

  /** distinct-preserving 4-token shingle hashes of a text column: 1-based
    * slice positions, space-joined, 60-bit md5 hash. The shared unit of
    * decontamination (train/eval n-gram overlap).
    */
  private def tokenShingleHashes(text: org.apache.spark.sql.Column, n: Int) = {
    // let-bind the split via a 1-element transform: referencing the raw
    // split() inside the positions lambda would re-run the regex for every
    // slice — O(tokens²) per row (the text13 finding, round 11)
    element_at(transform(array(TA.tokens(text)), toks =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => TA.hash60(array_join(slice(toks, i, lit(n)), " "))))
        .otherwise(array().cast("array<bigint>"))), 1)
  }

  private def sqlTokenShingleHashes(inner: String, n: Int): String =
    // mirrors tokenShingleHashes: unnest positions 1..len-(n-1), n-token
    // space-joined windows, hash60
    s"""SELECT doc_id, lang, is_eval,
        ${TA.Sql.hash60(s"array_to_string(toks[i:i+${n - 1}], ' ')")} AS sh
      FROM ($inner), UNNEST(generate_series(1, len(toks) - ${n - 1})) AS u(i)
      WHERE len(toks) >= $n"""

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Eval-set decontamination: flag training documents that share ANY
    // 4-token shingle with a held-out eval set (doc_id % 97 == 0 — the
    // deterministic stand-in for a benchmark suite). The scale shape is the
    // one that matters at 100 TB: the eval side is tiny (benchmarks are
    // thousands of documents, the corpus is billions), so its distinct
    // shingle set BROADCASTS and the train side is ONE scan + left-semi
    // probe — the corpus never shuffles on shingles. Reported per language:
    // train docs and contaminated train docs.
    GraftQuery(
      "decon01_eval_overlap",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("is_eval", col("doc_id") % 97 === 0)
        val sh = docs.select(col("doc_id"), col("is_eval"),
          explode(tokenShingleHashes(col("text"), 4)).as("sh"))
        val evalSh = sh.filter(col("is_eval")).select(col("sh")).distinct()
        val contam = sh.filter(!col("is_eval"))
          .join(broadcast(evalSh), Seq("sh"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("hit", lit(1))
        docs.filter(!col("is_eval"))
          .join(contam, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_train"), count(col("hit")).as("n_contam"))
      },
      Some {
        val base = "SELECT doc_id, lang, doc_id % 97 = 0 AS is_eval, " +
          s"${TA.Sql.tokens("text")} AS toks FROM documents"
        s"""WITH sh AS (${sqlTokenShingleHashes(base, 4)}),
          ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval),
          contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
                     WHERE NOT s.is_eval)
        SELECT lang, count(*) AS n_train,
          count(CASE WHEN doc_id IN (SELECT doc_id FROM contam) THEN 1 END) AS n_contam
        FROM documents WHERE doc_id % 97 <> 0 GROUP BY lang"""
      },
    ),

    // ------------------------------------------------------------------
    // Per-eval-document contamination pressure (the report a
    // decontamination run publishes, decon01's aggregate turned around):
    // for each held-out eval document, how many of its 4-token shingles
    // also occur ANYWHERE in the training split. Plan shape for 100 TB:
    // the eval shingle set is benchmark-sized → broadcasts into the train
    // scan; the distinct HIT set is ≤ eval-sized → broadcasts back onto
    // eval rows. The train corpus is scanned once and never shuffled.
    GraftQuery(
      "decon02_eval_pressure",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("is_eval", col("doc_id") % 97 === 0)
        // Persist ONLY the eval slice (benchmark-sized, 1/97 of docs) —
        // it feeds both the broadcast build and the final aggregate. The
        // train shingle stream is corpus-scale and must never be
        // materialized: it streams through the semi-join exactly once.
        val evalSh = docs.filter(col("is_eval"))
          .select(col("doc_id"), col("lang"),
            explode(tokenShingleHashes(col("text"), 4)).as("sh"))
          .transform(graft.core.Caches.persist)
        val hitSet = docs.filter(!col("is_eval"))
          .select(explode(tokenShingleHashes(col("text"), 4)).as("sh"))
          .join(broadcast(evalSh.select(col("sh")).distinct()), Seq("sh"), "left_semi")
          .distinct()
          .withColumn("hit", lit(1))
        evalSh.join(broadcast(hitSet), Seq("sh"), "left")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_shingles"),
            count(col("hit")).as("n_hit"))
          .withColumn("hit_ppm",
            round(col("n_hit") * 1000000.0 / col("n_shingles")).cast("long"))
      },
      Some {
        val base = "SELECT doc_id, lang, doc_id % 97 = 0 AS is_eval, " +
          s"${TA.Sql.tokens("text")} AS toks FROM documents"
        s"""WITH sh AS (${sqlTokenShingleHashes(base, 4)}),
          hits AS (SELECT DISTINCT e.sh FROM sh e
            WHERE e.is_eval AND e.sh IN (SELECT sh FROM sh WHERE NOT is_eval)),
          ev AS (SELECT doc_id, lang, sh FROM sh WHERE is_eval)
        SELECT doc_id, lang, count(*) AS n_shingles,
          count(CASE WHEN sh IN (SELECT sh FROM hits) THEN 1 END) AS n_hit,
          CAST(round(count(CASE WHEN sh IN (SELECT sh FROM hits) THEN 1 END)
            * 1000000.0e0 / count(*)) AS BIGINT) AS hit_ppm
        FROM ev GROUP BY 1, 2"""
      },
    ),

    // ------------------------------------------------------------------
    // Contamination REMOVAL (decon01 detects, this scrubs): every
    // non-overlapping 4-token chunk of a training document whose exact
    // token window occurs anywhere in the eval split is dropped; the
    // report counts chunks scrubbed, documents touched, and tokens kept
    // per language. Chunk hashes share tokenShingleHashes' format (1-based
    // slice, space-join, hash60), so a chunk matches iff its window
    // appears at ANY alignment in an eval document. Plan for 100 TB:
    // eval shingles are benchmark-sized → broadcast; the train corpus is
    // scanned once and only the lang-sized aggregates shuffle. The tail
    // (len mod 4 tokens) is always kept, making toks_kept exact integer
    // arithmetic: n_tokens - 4·n_dropped.
    GraftQuery(
      "decon03_scrub",
      (s, d) => {
        val W = 4
        val docs = Tables.documents(s, d)
          .withColumn("is_eval", col("doc_id") % 97 === 0)
        val evalSh = docs.filter(col("is_eval"))
          .select(explode(tokenShingleHashes(col("text"), W)).as("sh"))
          .distinct()
        val train = docs.filter(!col("is_eval"))
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("toks"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
        val idx = when(size(col("toks")) >= W,
            sequence(lit(0), (size(col("toks")) / W).cast("int") - 1))
          .otherwise(array().cast("array<int>"))
        val chunks = train.select(col("doc_id"), col("lang"),
          explode(transform(idx,
            j => TA.hash60(array_join(slice(col("toks"), j * W + 1, lit(W)), " ")))).as("ch"))
        val marked = chunks
          .join(broadcast(evalSh), chunks("ch") === evalSh("sh"), "left")
          .select(col("doc_id"), col("lang"), col("sh").isNotNull.as("hit"))
        val chunkAgg = marked.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("hit"), lit(1))).as("n_dropped"),
            countDistinct(when(col("hit"), col("doc_id"))).as("docs_touched"))
        train.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_train"), sum(col("n_tok")).as("n_tokens"))
          .join(chunkAgg, Seq("lang"), "left")
          .select(col("lang"), col("n_train"), col("n_tokens"),
            coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            coalesce(col("docs_touched"), lit(0L)).as("docs_touched"),
            (col("n_tokens") - lit(4L) * coalesce(col("n_dropped"), lit(0L)))
              .as("toks_kept"))
      },
      Some {
        val sh = TA.Sql.hash60("array_to_string(list_slice(toks, i, i + 3), ' ')")
        val ck = TA.Sql.hash60("array_to_string(list_slice(toks, j*4 + 1, j*4 + 4), ' ')")
        s"""WITH base AS (SELECT doc_id, lang, doc_id % 97 = 0 AS is_eval,
              ${TA.Sql.tokens("text")} AS toks FROM documents),
          ev AS (SELECT DISTINCT $sh AS sh
            FROM base, UNNEST(generate_series(1, len(toks) - 3)) AS u(i)
            WHERE is_eval AND len(toks) >= 4),
          tr AS (SELECT doc_id, lang, toks, len(toks) AS n_tok
            FROM base WHERE NOT is_eval),
          ch AS (SELECT doc_id, lang, $ck AS ch
            FROM tr, UNNEST(range(len(toks) // 4)) AS u(j)),
          mk AS (SELECT c.doc_id, c.lang, e.sh IS NOT NULL AS hit
            FROM ch c LEFT JOIN ev e ON c.ch = e.sh),
          ca AS (SELECT lang, count(*) AS n_chunks,
              count(*) FILTER (hit) AS n_dropped,
              count(DISTINCT CASE WHEN hit THEN doc_id END) AS docs_touched
            FROM mk GROUP BY 1),
          da AS (SELECT lang, count(*) AS n_train,
              CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM tr GROUP BY 1)
        SELECT da.lang, n_train, n_tokens,
          coalesce(n_chunks, 0) AS n_chunks,
          coalesce(n_dropped, 0) AS n_dropped,
          coalesce(docs_touched, 0) AS docs_touched,
          n_tokens - 4 * coalesce(n_dropped, 0) AS toks_kept
        FROM da LEFT JOIN ca USING (lang)"""
      },
    ),

    // ------------------------------------------------------------------
    // FUZZY decontamination (decon01's near-duplicate upgrade: real eval
    // leakage is rarely verbatim — paraphrases and partial copies slip
    // past exact-shingle matching, which is why production decontam runs
    // MinHash). The eval set is built IN the query as perturbed copies of
    // every 97th document (each 13th token dropped — a partial-copy leak
    // at token-Jaccard ≈ 0.6), so the oracle pins that the pipeline
    // catches planted leaks: 16-seed MinHash over token-4-gram shingle
    // sets, 8×2 LSH banding (2-row bands catch j≈0.6 pairs that 8-row
    // bands structurally miss), then an EXACT-Jaccard verify at 1/2 via
    // the integer cross-multiplication 3·|∩| ≥ |A|+|B|. One deterministic
    // banding miss (fr's planted leak at sf0.01) survives as honest LSH
    // behavior — both engines reproduce it from the same fixed seeds.
    // Scale shape: the eval side (1/97 of the corpus) broadcasts — band
    // keys AND shingle sets — so the train corpus is only ever scanned;
    // candidates travel ids-only (the sim04 rule: no array payload in any
    // exchange); one small shuffle total (the candidate distinct).
    GraftQuery(
      "decon04_fuzzy_decontam",
      (s, d) => {
        val P = Dedup.MinhashP
        val Seeds = 16
        val BandsN = 8
        val Rows = 2
        val toks = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("t"))
        val evalSide = toks.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("lang"), lit(true).as("is_eval"),
            filter(col("t"), (_, i) => (i + 1) % 13 =!= 0).as("t"))
        val sides = toks
          .select(col("doc_id"), col("lang"), lit(false).as("is_eval"), col("t"))
          .union(evalSide)
        val shingles = when(size(col("t")) >= 4,
          array_distinct(transform(sequence(lit(1), size(col("t")) - 3),
            i => TA.hash60(array_join(slice(col("t"), i, lit(4)), " ")) % P)))
        val docs = sides.filter(size(col("t")) >= 4)
          .select(col("doc_id"), col("lang"), col("is_eval"),
            shingles.as("sh"))
          .transform(graft.core.Caches.persist)
        val sigs = docs.select(col("doc_id"), col("is_eval"),
          Dedup.minhash(col("sh"), Seeds).as("sig"))
        val keys = sigs.select(col("doc_id"), col("is_eval"),
          explode(array((0 until BandsN).map { bd =>
            struct(lit(bd).as("band"), Dedup.bandKey(col("sig"), bd, Rows).as("key"))
          }: _*)).as("b"))
          .select(col("doc_id"), col("is_eval"),
            col("b.band").as("band"), col("b.key").as("key"))
        val evalKeys = keys.filter(col("is_eval"))
          .select(col("doc_id").as("eval_id"), col("band"), col("key"))
        val cand = keys.filter(!col("is_eval"))
          .join(broadcast(evalKeys), Seq("band", "key"))
          .select(col("doc_id"), col("eval_id")).distinct()
          .transform(graft.core.Caches.persist)
        val evalShs = docs.filter(col("is_eval"))
          .select(col("doc_id").as("eval_id"), col("sh").as("sh_e"))
        val contam = docs.filter(!col("is_eval"))
          .join(broadcast(cand), "doc_id")
          .join(broadcast(evalShs), "eval_id")
          .filter(lit(3) * size(array_intersect(col("sh"), col("sh_e"))) >=
            size(col("sh")) + size(col("sh_e")))
          .select(col("doc_id")).distinct().withColumn("bad", lit(1))
        val candIds = cand.select(col("doc_id")).distinct()
          .withColumn("hit", lit(1))
        docs.filter(!col("is_eval"))
          .join(candIds, Seq("doc_id"), "left")
          .join(contam, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_train"),
            count(col("hit")).as("n_cand"),
            count(col("bad")).as("n_contam"),
            coalesce(sum(when(col("bad").isNotNull, col("doc_id"))), lit(0L))
              .as("id_sum"))
      },
      Some {
        val P = Dedup.MinhashP
        val sigExprs = (0 until 16).map { i =>
          s"list_min(list_transform(s, x -> (${Dedup.minhashA(i)} * x + ${Dedup.minhashB(i)}) % $P)) AS m$i"
        }.mkString(", ")
        val bandKeys = (0 until 8).map { bd =>
          s"concat_ws(',', CAST(m${2 * bd} AS VARCHAR), CAST(m${2 * bd + 1} AS VARCHAR)) AS band$bd"
        }.mkString(", ")
        val h60 = TA.Sql.hash60("array_to_string(t[i:i+3], ' ')")
        val candU = (0 until 8).map { bd =>
          s"""SELECT t.doc_id, e.doc_id AS eval_id FROM keys t JOIN keys e
             ON NOT t.is_eval AND e.is_eval AND t.band$bd = e.band$bd"""
        }.mkString(" UNION ")
        s"""WITH tok AS (SELECT doc_id, lang,
              ${TA.Sql.tokens("text")} AS t FROM documents),
          sides AS (
            SELECT doc_id, lang, FALSE AS is_eval, t FROM tok
            UNION ALL
            SELECT doc_id, lang, TRUE, list_filter(t, (x, i) -> i % 13 <> 0)
            FROM tok WHERE doc_id % 97 = 0),
          shs AS (SELECT doc_id, lang, is_eval,
              list_distinct(list_transform(range(1, len(t) - 2),
                i -> $h60 % $P)) AS s
            FROM sides WHERE len(t) >= 4),
          sigs AS (SELECT doc_id, is_eval, $sigExprs FROM shs),
          keys AS (SELECT doc_id, is_eval, $bandKeys FROM sigs),
          cand AS ($candU),
          ver AS (SELECT DISTINCT c.doc_id FROM cand c
            JOIN shs a ON a.doc_id = c.doc_id AND NOT a.is_eval
            JOIN shs b ON b.doc_id = c.eval_id AND b.is_eval
            WHERE 3 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s)),
          ci AS (SELECT DISTINCT doc_id FROM cand)
        SELECT lang, count(*) AS n_train,
          count(CASE WHEN doc_id IN (SELECT doc_id FROM ci) THEN 1 END) AS n_cand,
          count(CASE WHEN doc_id IN (SELECT doc_id FROM ver) THEN 1 END) AS n_contam,
          coalesce(CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM ver)
            THEN doc_id END) AS BIGINT), 0) AS id_sum
        FROM shs WHERE NOT is_eval GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // The corpus -> training-shards pipeline in ONE composed plan (the
    // back half of the story pipe02's crawl->corpus front half starts):
    // quality gate (token band + stopword floor) -> eval decontamination
    // (any shared 4-token shingle with the eval slice drops the doc; the
    // eval slice itself never trains) -> exact dedup (min doc_id per
    // normalized fingerprint) -> hash-assignment to 16 pack shards with a
    // 512-token sequence budget -> REAL TFRecord container round trip per
    // bounded file group (shard -> many files, the shape a 100 TB export
    // actually writes; group size is schema-bounded so no collect ever
    // holds more than 128 documents). The per-shard audit pins surviving
    // docs/tokens/sequences, file counts, EXACT container bytes (16 bytes
    // of framing per record + payload), and an md5-derived checksum of
    // every payload AFTER the round trip — DuckDB reproduces all of it,
    // so a wrong byte anywhere in the 5-stage chain is a hash mismatch.
    GraftQuery(
      "pipe03_training_shard_prep",
      (s, d) => {
        import s.implicits._
        val M = 1000000007L
        def h60s(x: String): Long =
          graft.ops.Hash60Kernel.fold(graft.ops.Hash60Kernel.digest().digest(
            x.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
        val base = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(col("doc_id"), col("lang"), col("text"),
            TA.tokenCount(col("text")).cast("long").as("n_tok"),
            (col("doc_id") % 97 === 0).as("is_eval"))
          .transform(graft.core.Caches.persist)
        val kept = base.filter(col("n_tok").between(30, 100000) &&
          TA.stopwordCount(col("text")) >= 2)
        val evalSh = base.filter(col("is_eval"))
          .select(explode(tokenShingleHashes(col("text"), 4)).as("sh")).distinct()
        val contam = kept.filter(!col("is_eval"))
          .select(col("doc_id"), explode(tokenShingleHashes(col("text"), 4)).as("sh"))
          .join(broadcast(evalSh), Seq("sh"), "left_semi")
          .select(col("doc_id")).distinct()
        val clean = kept.filter(!col("is_eval"))
          .join(contam, Seq("doc_id"), "left_anti")
        val deduped = clean
          .withColumn("fp", TA.fingerprint(col("text")))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
        val packed = deduped.select(col("doc_id"), col("text"), col("n_tok"),
          (TA.hash60(concat(lit("pack:"), col("doc_id").cast("string"))) % 16)
            .as("shard"))
        packed
          .groupBy(col("shard"), expr("doc_id DIV 128").as("g"))
          .agg(sort_array(collect_list(struct(
              col("doc_id").as("_1"), col("text").as("_2")))).as("recs"),
            sum(col("n_tok")).as("toks"))
          .as[(Long, Long, Seq[(Long, String)], Long)]
          .map { case (shard, _, recs, toks) =>
            val payloads = recs.map(r =>
              r._2.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            val file = graft.ops.TfRecord.write(payloads)
            val back = graft.ops.TfRecord.read(file)
            val check = back.iterator.map(p => h60s(new String(p,
              java.nio.charset.StandardCharsets.US_ASCII)) % M).sum
            (shard, recs.size.toLong, toks, file.length.toLong, check)
          }
          .toDF("shard", "n_docs", "tok_sum", "bytes", "check")
          .groupBy(col("shard"))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("tok_sum")).as("tok_sum"),
            ceil(sum(col("tok_sum")) / lit(512.0)).cast("long").as("n_seqs"),
            count(lit(1)).as("n_files"),
            sum(col("bytes")).as("shard_bytes"),
            sum(col("check")).as("txt_check"))
      },
      Some {
        val base = "SELECT doc_id, lang, doc_id % 97 = 0 AS is_eval, " +
          s"${TA.Sql.tokens("text")} AS toks FROM documents"
        val keptBase = "SELECT doc_id, lang, doc_id % 97 = 0 AS is_eval, " +
          s"${TA.Sql.tokens("text")} AS toks FROM kept"
        s"""WITH b AS (SELECT doc_id, lang, text,
              ${TA.Sql.tokenCount("text")} AS n_tok,
              doc_id % 97 = 0 AS is_eval,
              ${TA.Sql.stopwordCount("text")} AS n_stop
            FROM documents),
          kept AS (SELECT * FROM b
            WHERE n_tok BETWEEN 30 AND 100000 AND n_stop >= 2),
          evsh AS (SELECT DISTINCT sh FROM (${sqlTokenShingleHashes(base, 4)})
            WHERE is_eval),
          ksh AS (${sqlTokenShingleHashes(keptBase, 4)}),
          contam AS (SELECT DISTINCT k.doc_id FROM ksh k JOIN evsh USING (sh)
            WHERE NOT k.is_eval),
          clean AS (SELECT * FROM kept WHERE NOT is_eval
            AND doc_id NOT IN (SELECT doc_id FROM contam)),
          dedup AS (SELECT * FROM (SELECT doc_id, text, n_tok,
              row_number() OVER (PARTITION BY ${TA.Sql.fingerprint("text")}
                ORDER BY doc_id) AS rn
            FROM clean) WHERE rn = 1),
          packed AS (SELECT doc_id, text, n_tok,
              ${TA.Sql.hash60("concat('pack:', CAST(doc_id AS VARCHAR))")} % 16
                AS shard
            FROM dedup)
        SELECT shard, count(*) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS tok_sum,
          CAST(ceil(sum(n_tok) / 512.0) AS BIGINT) AS n_seqs,
          count(DISTINCT doc_id // 128) AS n_files,
          CAST(16 * count(*) + sum(length(text)) AS BIGINT) AS shard_bytes,
          CAST(sum((CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT))
            % 1000000007) AS BIGINT) AS txt_check
        FROM packed GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1): the
    // seven standard document heuristics — word-count band, mean-word-length
    // band, symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    // alphabetic-word fraction, minimum stopword hits — each evaluated as an
    // INTEGER cross-multiplication (never a float ratio), so the pass/fail
    // bit is engine-exact. One projection over the corpus scan + one
    // map-side-combinable groupBy: at 100 TB this is a pure scan-rate
    // operator with a (lang, source)-sized output. The id_sum checksum over
    // full-pass documents makes the oracle sensitive to exactly WHICH
    // documents pass, not just how many.
    GraftQuery(
      "curate01_gopher_rules",
      (s, d) => {
        val c = col("text")
        val toks = TA.tokens(c)
        val nWords = size(toks)
        // chars excluding the n-1 single-space separators of normalized text
        val letters = length(c) - (nWords - 1)
        val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]")))
        val nSym = size(regexp_extract_all(c, lit("#"), lit(0))) +
          size(regexp_extract_all(c, lit("\\.\\.\\."), lit(0)))
        val lines = split(c, "\n", -1)
        val nLines = size(lines)
        val nBullet = size(filter(lines, l =>
          startswith(ltrim(l), lit("- ")) || startswith(ltrim(l), lit("* "))))
        val nEll = size(filter(lines, l => endswith(rtrim(l), lit("..."))))
        val rules = Seq(
          "p_words" -> nWords.between(50, 100000),
          "p_meanlen" -> (lit(3) * nWords <= letters && letters <= lit(10) * nWords),
          "p_symbol" -> (lit(10) * nSym <= nWords),
          "p_bullet" -> (lit(10) * nBullet <= lit(9) * nLines),
          "p_ellipsis" -> (lit(10) * nEll <= lit(3) * nLines),
          "p_alpha" -> (lit(5) * nAlpha >= lit(4) * nWords),
          "p_stop" -> (TA.stopwordCount(c) >= 2))
        val flagged = Tables.documents(s, d).select(
          col("doc_id") +: col("lang") +: col("source") +:
            rules.map { case (n, r) => r.cast("int").as(n) }: _*)
        val passAll = rules.map(r => col(r._1) === 1).reduce(_ && _)
        val aggs = count(lit(1)).as("n_docs") +:
          rules.map { case (n, _) => sum(col(n)).as(n) } :+
          count(when(passAll, lit(1))).as("n_pass_all") :+
          coalesce(sum(when(passAll, col("doc_id"))), lit(0L)).as("id_sum")
        flagged
          .groupBy(col("lang"), col("source"))
          .agg(aggs.head, aggs.tail: _*)
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH f AS (SELECT doc_id, lang, source,
            len($toks) AS n_words,
            length(text) - (len($toks) - 1) AS letters,
            len(list_filter($toks, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
            len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
            len(string_split(text, chr(10))) AS n_lines,
            len(list_filter(string_split(text, chr(10)),
              l -> starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* '))) AS n_bullet,
            len(list_filter(string_split(text, chr(10)),
              l -> ends_with(rtrim(l), '...'))) AS n_ell,
            ${TA.Sql.stopwordCount("text")} AS n_stop
          FROM documents),
        r AS (SELECT doc_id, lang, source,
            CAST(n_words BETWEEN 50 AND 100000 AS INT) AS p_words,
            CAST(3*n_words <= letters AND letters <= 10*n_words AS INT) AS p_meanlen,
            CAST(10*n_sym <= n_words AS INT) AS p_symbol,
            CAST(10*n_bullet <= 9*n_lines AS INT) AS p_bullet,
            CAST(10*n_ell <= 3*n_lines AS INT) AS p_ellipsis,
            CAST(5*n_alpha >= 4*n_words AS INT) AS p_alpha,
            CAST(n_stop >= 2 AS INT) AS p_stop
          FROM f)
        SELECT lang, source, count(*) AS n_docs,
          CAST(sum(p_words) AS BIGINT) AS p_words,
          CAST(sum(p_meanlen) AS BIGINT) AS p_meanlen,
          CAST(sum(p_symbol) AS BIGINT) AS p_symbol,
          CAST(sum(p_bullet) AS BIGINT) AS p_bullet,
          CAST(sum(p_ellipsis) AS BIGINT) AS p_ellipsis,
          CAST(sum(p_alpha) AS BIGINT) AS p_alpha,
          CAST(sum(p_stop) AS BIGINT) AS p_stop,
          count(*) FILTER (p_words=1 AND p_meanlen=1 AND p_symbol=1 AND p_bullet=1
            AND p_ellipsis=1 AND p_alpha=1 AND p_stop=1) AS n_pass_all,
          coalesce(CAST(sum(doc_id) FILTER (p_words=1 AND p_meanlen=1 AND p_symbol=1
            AND p_bullet=1 AND p_ellipsis=1 AND p_alpha=1 AND p_stop=1) AS BIGINT), 0)
            AS id_sum
        FROM r GROUP BY 1, 2"""
      },
    ),

    // ------------------------------------------------------------------
    // DSIR data selection (Xie et al. 2023, "Data Selection for Language
    // Models via Importance Resampling"): score every raw document by how
    // much its hashed-bigram profile resembles a small trusted target set
    // (here sources src0/src1), then select the target-like ones. Two
    // passes, both scan-shaped: pass A explodes bigrams and builds the
    // 512-bucket feature table (one map-side-combinable groupBy producing
    // ≤512 rows — collected to the DRIVER, never a corpus shuffle); the
    // per-bucket importance weight is a single rounded ppm division of
    // two exact add-one counts, so it is engine-exact. Pass B compiles
    // those 512 weights into an array LITERAL (the url05 plan-time-
    // compile pattern) and scores each document in ONE whole-stage-
    // codegen projection: aggregate(bigrams, Σ weight[h(b) mod 512]) —
    // exact 64-bit sums — then one rounded division per doc for its mean
    // weight in ppm. At 100 TB pass B is pure scan rate with zero
    // shuffles; the output groupBy is (lang, source)-sized. A document is
    // SELECTED when its mean bucket weight exceeds 1e6 (more target- than
    // raw-mass). The id_sum checksum pins exactly WHICH documents pass.
    GraftQuery(
      "curate02_dsir",
      (s, d) => {
        val K = 512
        // tokens materialize as their own projection column FIRST: lambda
        // bodies get no common-subexpression elimination, so building
        // bigrams straight off split(text) re-splits the document per
        // element — O(len²) per doc (measured 7.7 s -> 0.6 s at sf0.1)
        val bg = expr("CASE WHEN size(t) >= 2 THEN zip_with(" +
          "slice(t, 1, size(t)-1), slice(t, 2, size(t)-1), " +
          "(a, b) -> concat(a, ' ', b)) ELSE cast(array() AS array<string>) END")
        val bucket = (b: org.apache.spark.sql.Column) => pmod(TA.hash60(b), lit(K.toLong))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            TA.tokens(col("text")).as("t"))
        // pass A: 512-bucket target/raw counts -> exact ppm weights
        val isTgt = col("source").isin("src0", "src1")
        val w = docs.select(explode(bg).as("b"), isTgt.as("tgt"))
          .groupBy(bucket(col("b")).as("k"))
          .agg(count(when(col("tgt"), lit(1))).as("t"),
            count(when(!col("tgt"), lit(1))).as("r"))
          .select(col("k"),
            round(lit(1e6) * (col("t") + 1) / (col("r") + 1)).cast("long").as("lam"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val weights = (0 until K).map(k => w.getOrElse(k.toLong, 1000000L))
        // pass B: one projection, zero shuffles before the tiny groupBy
        val wlit = typedLit(weights)
        val scored = docs.select(col("doc_id"), col("lang"), col("source"),
            bg.as("bg"))
          .select(col("doc_id"), col("lang"), col("source"),
            size(col("bg")).as("nb"),
            aggregate(col("bg"), lit(0L), (acc, b) =>
              acc + element_at(wlit, (bucket(b) + 1).cast("int"))).as("wsum"))
          .select(col("doc_id"), col("lang"), col("source"),
            when(col("nb") > 0,
              round(col("wsum").cast("double") / col("nb")).cast("long"))
              .otherwise(0L).as("score_ppm"))
        scored
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("score_ppm") > 1000000L, lit(1))).as("n_sel"),
            sum(col("score_ppm")).as("score_sum"),
            coalesce(sum(when(col("score_ppm") > 1000000L, col("doc_id"))),
              lit(0L)).as("id_sum"))
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH tok AS (SELECT doc_id, lang, source, $toks AS t FROM documents),
          bg AS (SELECT doc_id, lang, source,
              CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                ELSE [] END AS bgs
            FROM tok),
          ex AS (SELECT doc_id, source, unnest(bgs) AS b FROM bg),
          kb AS (SELECT ${TA.Sql.hash60("b")} % 512 AS k,
              source IN ('src0', 'src1') AS tgt FROM ex),
          w AS (SELECT k, CAST(round(1e6 * (count(CASE WHEN tgt THEN 1 END) + 1)
                / (count(CASE WHEN NOT tgt THEN 1 END) + 1)) AS BIGINT) AS lam
            FROM kb GROUP BY 1),
          dx AS (SELECT doc_id, ${TA.Sql.hash60("b")} % 512 AS k FROM ex),
          ds AS (SELECT dx.doc_id, count(*) AS nb,
              CAST(sum(coalesce(lam, 1000000)) AS BIGINT) AS wsum
            FROM dx LEFT JOIN w USING (k) GROUP BY 1),
          sc AS (SELECT b.doc_id, b.lang, b.source,
              CASE WHEN coalesce(nb, 0) > 0
                THEN CAST(round(CAST(wsum AS DOUBLE) / nb) AS BIGINT)
                ELSE 0 END AS score_ppm
            FROM bg b LEFT JOIN ds ON b.doc_id = ds.doc_id)
        SELECT lang, source, count(*) AS n_docs,
          count(CASE WHEN score_ppm > 1000000 THEN 1 END) AS n_sel,
          CAST(sum(score_ppm) AS BIGINT) AS score_sum,
          coalesce(CAST(sum(CASE WHEN score_ppm > 1000000 THEN doc_id END)
            AS BIGINT), 0) AS id_sum
        FROM sc GROUP BY 1, 2"""
      },
    ),

    // ------------------------------------------------------------------
    // License detection + copyleft filtering (round 13): the curation
    // rule every CODE corpus applies before pretraining — classify
    // documents by canonical license phrases (SPDX-style fingerprints),
    // keep permissive (MIT/Apache-2.0), DROP copyleft (GPL), and
    // checksum exactly what survives. License tails are planted on a
    // hash-selected slice (the text07 injection convention: both engines
    // derive the same corpus); detection is pure per-row `contains`, so
    // the scan is shuffle-free until the source rollup and at 100 TB the
    // phrase table extends to the full SPDX set as a broadcast with the
    // same plan.
    GraftQuery(
      "curate03_license_detect",
      (s, d) => {
        val mit = "Permission is hereby granted, free of charge, to any person obtaining a copy"
        val apache = "Licensed under the Apache License, Version 2.0"
        val gpl = "under the terms of the GNU General Public License"
        val sel = TA.hash60(concat(lit("lic:"), col("doc_id").cast("string"))) % 10
        val t2 = concat(col("text"),
          when(sel === 0, lit(" " + mit))
            .when(sel === 1, lit(" " + apache))
            .when(sel === 2, lit(" " + gpl))
            .otherwise(lit("")))
        val lic = when(col("t2").contains(mit), "mit")
          .when(col("t2").contains(apache), "apache-2.0")
          .when(col("t2").contains(gpl), "gpl-3.0")
          .otherwise("none")
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), t2.as("t2"))
          .withColumn("license", lic)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("license") === "mit", 1)).as("n_mit"),
            count(when(col("license") === "apache-2.0", 1)).as("n_apache"),
            count(when(col("license") === "gpl-3.0", 1)).as("n_copyleft_dropped"),
            count(when(col("license") === "none", 1)).as("n_unlicensed"),
            sum(when(col("license") =!= "gpl-3.0",
              TA.hash60(col("t2")) % TarQueries.M).otherwise(0L)).as("kept_check"))
      },
      Some {
        val mit = "Permission is hereby granted, free of charge, to any person obtaining a copy"
        val apache = "Licensed under the Apache License, Version 2.0"
        val gpl = "under the terms of the GNU General Public License"
        s"""WITH t AS (
          SELECT source, doc_id,
            text || CASE ${TA.Sql.hash60("'lic:' || CAST(doc_id AS VARCHAR)")} % 10
              WHEN 0 THEN ' $mit'
              WHEN 1 THEN ' $apache'
              WHEN 2 THEN ' $gpl'
              ELSE '' END AS t2
          FROM documents),
        c AS (SELECT source, t2,
            CASE WHEN contains(t2, '$mit') THEN 'mit'
              WHEN contains(t2, '$apache') THEN 'apache-2.0'
              WHEN contains(t2, '$gpl') THEN 'gpl-3.0'
              ELSE 'none' END AS license
          FROM t)
        SELECT source, count(*) AS n_docs,
          count(CASE WHEN license = 'mit' THEN 1 END) AS n_mit,
          count(CASE WHEN license = 'apache-2.0' THEN 1 END) AS n_apache,
          count(CASE WHEN license = 'gpl-3.0' THEN 1 END) AS n_copyleft_dropped,
          count(CASE WHEN license = 'none' THEN 1 END) AS n_unlicensed,
          CAST(sum(CASE WHEN license <> 'gpl-3.0'
            THEN ${TA.Sql.hash60("t2")} % ${TarQueries.M} ELSE 0 END) AS BIGINT)
            AS kept_check
        FROM c GROUP BY 1"""
      },
    ),
  )
}
