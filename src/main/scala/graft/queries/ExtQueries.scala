package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Dedup, DedupGraph, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (dedup / similarity / text analysis)
  * over the documents and embeddings tables, each with an exact DuckDB
  * oracle: hashes are md5-prefix integers and vector math is double-cast
  * sequential accumulation, both verified bit-identical across engines.
  */
object ExtQueries {

  private val Shingle = 3
  private val MinhashSeeds = 16
  // 2 bands × 8 rows: band-collision prob = j^8 — this corpus has high
  // baseline jaccard (shared small vocab), so wider bands would explode the
  // candidate set (j≈0.5 → 6% of ALL pairs per 4-row band).
  private val Bands = 2
  private val RowsPerBand = 8
  // dedup02's exact all-pairs cap: (lang, source) blocks beyond this route
  // through LSH star candidates. Far above any test-SF block size (sf0.1 has
  // 5k documents TOTAL), so oracle parity holds through sf0.1 by construction.
  private val JaccardBlockCap = 4096

  /** explode a (id, sig) frame into (id, band, key) rows — the ONE LSH
    * banding shared by dedup03 (pair join), dedup07 (star edges) and
    * dedup10 (index probe); a band-scheme change edits exactly here.
    */
  private def bandedKeys(df: DataFrame, idCol: String): DataFrame = df
    .select(col(idCol),
      explode(array((0 until Bands).map { bd =>
        struct(lit(bd).as("band"), Dedup.bandKey(col("sig"), bd, RowsPerBand).as("key"))
      }: _*)).as("b"))
    .select(col(idCol), col("b.band"), col("b.key"))

  /** oracle mirrors of the signature (m0..mN) and band-key columns. */
  private def sqlSigExprs: String = (0 until MinhashSeeds).map { i =>
    s"list_min(list_transform(s, x -> (${Dedup.minhashA(i)} * x + ${Dedup.minhashB(i)}) % ${Dedup.MinhashP})) AS m$i"
  }.mkString(", ")
  private def sqlBandKeys: String = (0 until Bands).map { bd =>
    val cols = (0 until RowsPerBand).map(r => s"CAST(m${bd * RowsPerBand + r} AS VARCHAR)")
    s"concat_ws(',', ${cols.mkString(", ")}) AS band$bd"
  }.mkString(", ")

  /** DuckDB 31-bit shingle-hash set (mirror of Dedup.shingleHashes). */
  private def sqlShingleHashes(v: String) =
    s"list_distinct(list_transform(range(1, length($v) - ${Shingle - 2}), " +
      s"i -> ${TA.Sql.hash60(s"substring($v, i, $Shingle)")} % ${Dedup.MinhashP}))"

  private def embDouble(c: Column): Column = Similarity.toDouble(c)

  /** PQ encode SQL CTEs (sub/cb/enc/rec over a CTE `e(id, v)`) — the
    * DuckDB mirror of [[Similarity.pqReconstruct]], shared by sim07 and
    * sim09; a codebook-scheme change edits exactly that pair. The reduced
    * L2 key (`c·c − 2·s·c`, per-vector constant s·s dropped) is mirrored
    * TEXTUALLY so both engines order by the same float values.
    */
  private[queries] def pqSqlCtes: String =
    """sub AS (SELECT id, m, list_slice(v, m*8 + 1, m*8 + 8) AS sv
          FROM e, UNNEST(range(8)) AS g(m)),
        cb AS (SELECT m, CAST(id AS INT) AS code, sv AS cv FROM sub WHERE id < 16),
        enc AS (SELECT id, m, code FROM (
            SELECT s.id, s.m, c.code,
              row_number() OVER (PARTITION BY s.id, s.m ORDER BY
                list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv),
                c.code) AS rn
            FROM sub s JOIN cb c ON s.m = c.m) WHERE rn = 1),
        rec AS (SELECT n.id, flatten(list(c.cv ORDER BY n.m)) AS rvec
          FROM enc n JOIN cb c ON n.m = c.m AND n.code = c.code GROUP BY n.id)"""

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
    GraftQuery(
      "dedup01_exact",
      (s, d) => Dedup.exactStats(Tables.documents(s, d), col("text")),
      Some(s"""SELECT count(*) AS n_distinct, CAST(sum(copies) AS BIGINT) AS n_docs,
          CAST(sum(copies - 1) AS BIGINT) AS n_duplicates, max(copies) AS max_copies
        FROM (SELECT ${TA.Sql.fingerprint("text")} AS fp, count(*) AS copies,
          min(doc_id) AS canonical_doc FROM documents GROUP BY 1)"""),
    ),

    // ------------------------------------------------------------------
    // word-bigram top-k per language (n-gram frequency analysis).
    GraftQuery(
      "text05_bigram_topk",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val bigrams = when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
          .otherwise(array().cast("array<string>"))
        val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram").asc)
        Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
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
    // exact-dedup survivors: lowest doc_id per content fingerprint.
    GraftQuery(
      "dedup06_exact_survivors",
      (s, d) => Dedup.exactDedup(Tables.documents(s, d), col("text"))
        .select(col("doc_id"), col("lang"), col("source")),
      Some(s"""SELECT doc_id, lang, source FROM (
          SELECT doc_id, lang, source,
            row_number() OVER (PARTITION BY ${TA.Sql.fingerprint("text")}
              ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1"""),
    ),

    // ------------------------------------------------------------------
    // pairwise n-gram Jaccard within (lang, source) blocks, with a fan-out
    // cap: blocks beyond JaccardBlockCap rows route through LSH star
    // candidates instead of all-pairs (Dedup.jaccardPairsBlocked), so a hot
    // (en, web) block at 100 TB stays O(Σ|bucket|) instead of O(n²). Under
    // the cap (all test SFs — documents tops out well below it) the result
    // is EXACTLY the all-pairs oracle below; ScaleStressSpec pins the capped
    // path's bounded fan-out on a synthetic hot block.
    GraftQuery(
      "dedup02_ngram_jaccard",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
          col("doc_id"), col("lang"), col("source"),
          Dedup.shingleHashesFused(col("text"), Shingle).as("sh"))
          .transform(graft.core.Caches.persist) // shingle once; both join sides + no optimizer re-inline
        Dedup.jaccardPairsBlocked(docs, Seq("lang", "source"), 0.62,
          JaccardBlockCap, MinhashSeeds, Bands, RowsPerBand)
      },
      Some(s"""WITH sh AS (SELECT doc_id, lang, source, ${sqlShingleHashes("text")} AS s FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jac
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.62"""),
    ),

    // ------------------------------------------------------------------
    // MinHash + LSH banding: deterministic seeded signatures, band-bucket
    // join → candidate pairs (the scalable near-dup path).
    GraftQuery(
      "dedup03_minhash_lsh",
      (s, d) => {
        val sigs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
          col("doc_id"),
          Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"))
          .transform(graft.core.Caches.persist) // signature computed once, not re-inlined per band/side
        // Candidate enumeration through the HOT-BUCKET CAP (one collapsed
        // band key — a boilerplate-duplicated corpus — would make the raw
        // band self-join quadratic in bucket size). With no hot bucket the
        // plan is EXACTLY the plain band-key self-join, so the oracle below
        // (plain banding) stays hash-identical at every test SF.
        Dedup.bandedPairsCappedOrdered(bandedKeys(sigs, "doc_id"), "doc_id",
          JaccardBlockCap)
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a JOIN keys b ON a.band$bd = b.band$bd AND a.doc_id < b.doc_id"
        }.mkString(" UNION ")
        s"""WITH sh AS (SELECT doc_id, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs)
        $unions"""
      },
    ),

    // ------------------------------------------------------------------
    // SimHash near-dup: 60-bit token-vote hash, hamming<=10 within lang.
    GraftQuery(
      "dedup04_simhash",
      (s, d) => {
        // Hamming-LSH banding, LOSSLESS by pigeonhole: 12 disjoint 5-bit
        // bands of the 60-bit signature — any pair within hamming 10 (< 12
        // differing bits) leaves at least one band untouched, so the banded
        // equi-join generates EVERY qualifying candidate and the exact
        // hamming verify reproduces the all-pairs result (the oracle below
        // stays the plain self-join). Fan-out is per (lang, band, 5-bit
        // key) bucket — linear in bucket size — never O(block²).
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
          col("doc_id"), col("lang"),
          Dedup.simhash(Dedup.tokenHashes(col("text"))).as("sh"))
          .transform(graft.core.Caches.persist) // hash once; both join sides reuse
        val banded = docs.select(col("doc_id"), col("lang"), col("sh"),
          explode(array((0 until 12).map { b =>
            struct(lit(b).as("band"),
              shiftright(col("sh"), 5 * b).bitwiseAND(lit(31L)).as("key"))
          }: _*)).as("b"))
          .select(col("doc_id"), col("lang"), col("sh"),
            col("b.band").as("band"), col("b.key").as("key"))
        val a = banded.select(col("doc_id").as("doc_a"), col("lang"),
          col("band"), col("key"), col("sh").as("sh_a"))
        val b = banded.select(col("doc_id").as("doc_b"), col("lang"),
          col("band"), col("key"), col("sh").as("sh_b"))
        // emit each pair only from its FIRST colliding band (every earlier
        // band's keys must differ) — exactly-once without a dropDuplicates
        // shuffle of the candidate set
        val firstBandOnly = (0 until 11).map { j =>
          col("band") <= j ||
            shiftright(col("sh_a"), 5 * j).bitwiseAND(lit(31L)) =!=
              shiftright(col("sh_b"), 5 * j).bitwiseAND(lit(31L))
        }.reduce(_ && _)
        a.join(b, Seq("lang", "band", "key"))
          .filter(col("doc_a") < col("doc_b"))
          .filter(firstBandOnly)
          .select(col("doc_a"), col("doc_b"),
            Dedup.hamming(col("sh_a"), col("sh_b")).cast("long").as("dist"))
          .filter(col("dist") <= 10)
      },
      Some {
        val votes = (0 until Dedup.simhashBits).map { b =>
          s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << $b) ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH th AS (SELECT doc_id, lang,
            list_transform(list_distinct(${TA.Sql.tokens("text")}), t -> ${TA.Sql.hash60("t")}) AS th
          FROM documents),
          sh AS (SELECT doc_id, lang, $votes AS sh FROM th)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 10"""
      },
    ),

    // ------------------------------------------------------------------
    // embedding-cosine near-dup within label blocks (exact doubles).
    // Scale note: cosine admits no lossless banding (unlike dedup04's
    // hamming pigeonhole), so this stays the exact all-pairs-within-label
    // DEFINITION; the corpus-scale execution of the same semantics is
    // dedup09 (SemDeDup: k-means-scoped pairs, hot clusters degrade to SRP
    // star edges) — run that when a label block can exceed memory-feasible
    // pair counts.
    GraftQuery(
      "dedup05_embedding",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
          col("vec_id"), col("label"), embDouble(col("embedding")).as("v"))
          .withColumn("n", Similarity.norm(col("v")))
          .transform(graft.core.Caches.persist) // norms once per vector, not per pair
        val a = e.select(col("vec_id").as("id_a"), col("label"), col("v").as("v_a"), col("n").as("n_a"))
        val b = e.select(col("vec_id").as("id_b"), col("label"), col("v").as("v_b"), col("n").as("n_b"))
        a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .select(col("label"), col("id_a"), col("id_b"),
            (Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))).as("cos"))
          .filter(col("cos") >= 0.35)
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
          list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35"""),
    ),

    // ------------------------------------------------------------------
    // brute-force cosine top-5 for the first 20 vectors (exact baseline).
    GraftQuery(
      "sim01_topk_bruteforce",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        Similarity.bruteForceTopK(e.filter(col("id") < 20), e, 5)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT q_id, n_id, cos, rnk FROM (
          SELECT a.id AS q_id, b.id AS n_id,
            list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos,
            row_number() OVER (PARTITION BY a.id
              ORDER BY list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) DESC, b.id ASC) AS rnk
          FROM e a JOIN e b ON a.id < 20 AND b.id <> a.id)
        WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // IVF-style: assign every vector to nearest of 16 seed centroids
    // (vec_id 0-15), search top-3 within the query's cell only.
    GraftQuery(
      "sim02_ivf_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        val cells = Similarity.assignCells(e, e.filter(col("id") < 16))
        val q = cells.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("cell_id"), col("vec").as("q_vec"))
        val cand = cells.select(col("id").as("n_id"), col("cell_id"), col("vec").as("n_vec"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        q.join(cand, Seq("cell_id"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("cell_id"), col("n_id"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT id AS cell_id, v AS cv FROM e WHERE id < 16),
        assign AS (
          SELECT id, cell_id, v FROM (
            SELECT e.id, s.cell_id, e.v,
              row_number() OVER (PARTITION BY e.id ORDER BY
                list_dot_product(e.v, s.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS rn
            FROM e CROSS JOIN seeds s) WHERE rn = 1),
        scored AS (
          SELECT q.id AS q_id, q.cell_id, c.id AS n_id,
            list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM assign q JOIN assign c ON q.cell_id = c.cell_id AND q.id < 20 AND c.id <> q.id)
        SELECT q_id, cell_id, n_id, cos, rnk FROM (
          SELECT q_id, cell_id, n_id, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
          FROM scored) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // int8-quantized similarity: symmetric per-vector quantization, exact
    // integer dot products (bit-identical cross-engine — the compression
    // layer of a large vector index), top-3 by quantized cosine.
    GraftQuery(
      "sim03_int8_quant",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"),
            Similarity.quantizeInt8(embDouble(col("embedding"))).as("qv"))
          .withColumn("qn", Similarity.normInt8(col("qv")))
          .transform(graft.core.Caches.persist)
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("qv").as("q_qv"), col("qn").as("q_qn"))
        val c = e.select(col("id").as("n_id"), col("qv").as("n_qv"), col("qn").as("n_qn"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("n_id").asc)
        broadcast(q).crossJoin(c)
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosineInt8(col("q_qv"), col("n_qv"), col("q_qn"), col("n_qn")).as("qcos"))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        m AS (SELECT id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
        q AS (SELECT id, CASE WHEN ma = 0 THEN list_transform(v, x -> 0::BIGINT)
              ELSE list_transform(v, x -> CAST(round(x * 127.0 / ma) AS BIGINT)) END AS qv FROM m),
        n AS (SELECT id, qv, sqrt(list_dot_product(qv, qv)) AS qn FROM q)
        SELECT q_id, n_id, qcos, rnk FROM (
          SELECT a.id AS q_id, b.id AS n_id,
            list_dot_product(a.qv, b.qv) / (a.qn * b.qn) AS qcos,
            row_number() OVER (PARTITION BY a.id
              ORDER BY list_dot_product(a.qv, b.qv) / (a.qn * b.qn) DESC, b.id ASC) AS rnk
          FROM n a JOIN n b ON a.id < 20 AND b.id <> a.id)
        WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // MMR diversified re-rank (Carbonell & Goldstein '98, λ=0.5): take each
    // query's top-10 relevance candidates, then pick 3 greedily, each pick
    // penalized by its max similarity to the already-picked set. The greedy
    // loop UNROLLS to three window passes over the candidate frames — the
    // per-query candidate set is k (constant), so the pairwise-similarity
    // join is k² per query, independent of corpus size; the corpus itself
    // is touched only by the sim01-style broadcast relevance scan. Scores
    // quantize to integer micro-cosines, ties break on n_id — argmaxes are
    // exact cross-engine.
    GraftQuery(
      "sim05_mmr_rerank",
      (s, d) => {
        val micro = (c: org.apache.spark.sql.Column) =>
          round(c * 1000000.0).cast("long")
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .withColumn("nn", Similarity.norm(col("vec")))
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"), col("nn").as("q_n"))
        val cW = Window.partitionBy(col("q_id"))
          .orderBy(col("rel_micro").desc, col("n_id").asc)
        val cand = broadcast(q).crossJoin(
            e.select(col("id").as("n_id"), col("vec").as("n_vec"), col("nn").as("n_n")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("n_vec"), col("n_n"),
            micro(Similarity.dot(col("q_vec"), col("n_vec")) /
              (col("q_n") * col("n_n"))).as("rel_micro"))
          .withColumn("rn", row_number().over(cW)).filter(col("rn") <= 10)
          .transform(graft.core.Caches.persist)
        val pairs = cand.as("a").join(cand.as("b"),
            col("a.q_id") === col("b.q_id") && col("a.n_id") =!= col("b.n_id"))
          .select(col("a.q_id").as("q_id"), col("a.n_id").as("i"), col("b.n_id").as("j"),
            micro(Similarity.dot(col("a.n_vec"), col("b.n_vec")) /
              (col("a.n_n") * col("b.n_n"))).as("sim_micro"))
          .transform(graft.core.Caches.persist)
        val slim = cand.select(col("q_id"), col("n_id"), col("rel_micro"), col("rn"))
        val p1 = slim.filter(col("rn") === 1)
          .select(col("q_id"), col("n_id").as("c1"), col("rel_micro").as("rel1"))
        val w2 = Window.partitionBy(col("q_id")).orderBy(col("score2").desc, col("n_id").asc)
        val p2 = slim.join(p1, "q_id").filter(col("n_id") =!= col("c1"))
          .join(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c1"),
            col("sim_micro")), Seq("q_id", "n_id", "c1"))
          .withColumn("score2", col("rel_micro") - col("sim_micro"))
          .withColumn("rn2", row_number().over(w2)).filter(col("rn2") === 1)
          .select(col("q_id"), col("n_id").as("c2"), col("rel_micro").as("rel2"))
        val w3 = Window.partitionBy(col("q_id")).orderBy(col("score3").desc, col("n_id").asc)
        val p3 = slim.join(p1, "q_id").join(p2, "q_id")
          .filter(col("n_id") =!= col("c1") && col("n_id") =!= col("c2"))
          .join(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c1"),
            col("sim_micro").as("sim1")), Seq("q_id", "n_id", "c1"))
          .join(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c2"),
            col("sim_micro").as("sim2")), Seq("q_id", "n_id", "c2"))
          .withColumn("score3", col("rel_micro") - greatest(col("sim1"), col("sim2")))
          .withColumn("rn3", row_number().over(w3)).filter(col("rn3") === 1)
          .select(col("q_id"), col("n_id").as("c3"), col("rel_micro").as("rel3"))
        p1.select(col("q_id"), lit(1L).as("pick"), col("c1").as("n_id"),
            col("rel1").as("rel_micro"))
          .unionAll(p2.select(col("q_id"), lit(2L).as("pick"), col("c2").as("n_id"),
            col("rel2").as("rel_micro")))
          .unionAll(p3.select(col("q_id"), lit(3L).as("pick"), col("c3").as("n_id"),
            col("rel3").as("rel_micro")))
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT id, v, sqrt(list_dot_product(v,v)) AS nn FROM e),
        scored AS (SELECT a.id AS q_id, b.id AS n_id, b.v AS bv, b.nn AS bn,
            CAST(round(list_dot_product(a.v,b.v)/(a.nn*b.nn)*1000000.0) AS BIGINT) AS rel_micro
          FROM n a JOIN n b ON a.id < 20 AND b.id <> a.id),
        cand AS (SELECT * FROM (SELECT q_id, n_id, bv, bn, rel_micro,
            row_number() OVER (PARTITION BY q_id ORDER BY rel_micro DESC, n_id) AS rn FROM scored)
          WHERE rn <= 10),
        pairs AS (SELECT a.q_id, a.n_id AS i, b.n_id AS j,
            CAST(round(list_dot_product(a.bv,b.bv)/(a.bn*b.bn)*1000000.0) AS BIGINT) AS sim_micro
          FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
        p1 AS (SELECT q_id, n_id AS c1, rel_micro AS rel1 FROM cand WHERE rn = 1),
        s2 AS (SELECT c.q_id, c.n_id, c.rel_micro,
            row_number() OVER (PARTITION BY c.q_id
              ORDER BY c.rel_micro - p.sim_micro DESC, c.n_id) AS rn2
          FROM cand c JOIN p1 ON p1.q_id = c.q_id
            JOIN pairs p ON p.q_id = c.q_id AND p.i = c.n_id AND p.j = p1.c1
          WHERE c.n_id <> p1.c1),
        p2 AS (SELECT q_id, n_id AS c2, rel_micro AS rel2 FROM s2 WHERE rn2 = 1),
        s3 AS (SELECT c.q_id, c.n_id, c.rel_micro,
            row_number() OVER (PARTITION BY c.q_id
              ORDER BY c.rel_micro - greatest(pa.sim_micro, pb.sim_micro) DESC, c.n_id) AS rn3
          FROM cand c JOIN p1 ON p1.q_id = c.q_id JOIN p2 ON p2.q_id = c.q_id
            JOIN pairs pa ON pa.q_id = c.q_id AND pa.i = c.n_id AND pa.j = p1.c1
            JOIN pairs pb ON pb.q_id = c.q_id AND pb.i = c.n_id AND pb.j = p2.c2
          WHERE c.n_id <> p1.c1 AND c.n_id <> p2.c2),
        p3 AS (SELECT q_id, n_id AS c3, rel_micro AS rel3 FROM s3 WHERE rn3 = 1)
        SELECT q_id, CAST(1 AS BIGINT) AS pick, c1 AS n_id, rel1 AS rel_micro FROM p1
        UNION ALL SELECT q_id, 2, c2, rel2 FROM p2
        UNION ALL SELECT q_id, 3, c3, rel3 FROM p3"""),
    ),

    // ------------------------------------------------------------------
    // Flesch reading-ease readability (quality-signal family): words,
    // sentence-ending punctuation runs, and vowel-group "syllables" are
    // exact regexp counts; the score is ONE fixed-order double expression
    // of two integer ratios, micro-rounded once — textually mirrored in
    // the oracle (DuckDB decimal literals written as e0 doubles). A pure
    // projection: no shuffle, no UDF, whole-stage codegen end to end.
    GraftQuery(
      "text14_readability",
      (s, d) => {
        val w = TA.tokenCount(col("text")).cast("long")
        val sents = greatest(
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1)).cast("long")
        val syl = size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long")
        Tables.documents(s, d).select(
          col("doc_id"), w.as("n_words"), sents.as("n_sents"), syl.as("n_syll"))
          .withColumn("flesch_micro",
            round((lit(206.835) - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
              - lit(84.6) * (col("n_syll").cast("double") / col("n_words"))) * 1000000.0)
              .cast("long"))
      },
      Some(s"""WITH c AS (SELECT doc_id,
            CAST(${TA.Sql.tokenCount("text")} AS BIGINT) AS n_words,
            CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents,
            CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
          FROM documents)
        SELECT doc_id, n_words, n_sents, n_syll,
          CAST(round((206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE) / n_sents)
            - 84.6e0 * (CAST(n_syll AS DOUBLE) / n_words)) * 1000000.0) AS BIGINT)
            AS flesch_micro
        FROM c"""),
    ),

    // ------------------------------------------------------------------
    // Shingle-set containment (quote / doc-in-doc detection): Jaccard
    // misses a short document embedded in a long one (the union dilutes
    // it), so the signal is |A∩B| / min(|A|,|B|) ≥ 0.9. Candidates come
    // from the SAME MinHash-LSH banding as dedup03 (band key = shuffle
    // key, never all-pairs); the exact set intersection then runs only on
    // collisions, re-ranked through two doc_id-keyed joins against the
    // persisted shingle-set frame. The threshold compare is pure integer
    // arithmetic (inter·10⁶ ≥ 9·10⁵·min) — no float anywhere.
    GraftQuery(
      "dedup12_containment",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            Dedup.shingleHashesFused(col("text"), Shingle).as("sh"),
            // fused one-pass signature (identical values to minhash(sh) —
            // MinhashSigSpec); the composed form would re-traverse the
            // shingle array 16 times per doc
            Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"))
          .transform(graft.core.Caches.persist) // shingle once; banding + both re-rank sides reuse
        // Same hot-bucket cap as dedup03: a collapsed band bucket degrades
        // to hub star edges (O(|bucket|)); with no hot bucket the plan is
        // the plain band self-join, so the plain-banding oracle holds.
        val cand = Dedup.bandedPairsCappedOrdered(bandedKeys(docs, "doc_id"),
          "doc_id", JaccardBlockCap)
        val sets = docs.select(col("doc_id"), col("sh"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
            size(col("sa")).cast("long").as("size_a"),
            size(col("sb")).cast("long").as("size_b"))
          .filter(col("inter") * 1000000L >= lit(900000L) * least(col("size_a"), col("size_b")))
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a JOIN keys b ON a.band$bd = b.band$bd AND a.doc_id < b.doc_id"
        }.mkString(" UNION ")
        s"""WITH sh AS (SELECT doc_id, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs),
          cand AS ($unions)
        SELECT c.doc_a, c.doc_b,
          CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
          CAST(len(a.s) AS BIGINT) AS size_a,
          CAST(len(b.s) AS BIGINT) AS size_b
        FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
        WHERE CAST(len(list_intersect(a.s, b.s)) AS BIGINT) * 1000000 >=
          900000 * least(len(a.s), len(b.s))"""
      },
    ),

    // ------------------------------------------------------------------
    // near-dup CLUSTERS: connected components over the MinHash-LSH candidate
    // pairs (iterative min-label propagation, one shuffle per round — the
    // "keep one per cluster" resolution step of a dedup pipeline). Oracle:
    // recursive-CTE transitive closure + min-member label.
    GraftQuery(
      "dedup07_components",
      (s, d) => {
        val sigs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(
            col("doc_id"),
            Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"))
          .transform(graft.core.Caches.persist)
        val banded = bandedKeys(sigs, "doc_id")
        // STAR edges, not clique pairs: connect every bucket member to the
        // bucket's min doc. Identical connected components, but O(Σ|bucket|)
        // edges instead of O(Σ|bucket|²) — a hot LSH bucket (boilerplate docs)
        // would otherwise explode quadratically at scale. Buckets of size 1
        // emit nothing, exactly like the pair join.
        val hubW = Window.partitionBy(col("band"), col("key"))
        val edges = banded
          .withColumn("hub", min(col("doc_id")).over(hubW))
          .filter(col("doc_id") =!= col("hub"))
          .select(col("hub").as("a"), col("doc_id").as("b"))
          .distinct()
        DedupGraph.connectedComponents(edges)
          .select(col("node").as("doc_id"), col("component"))
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"SELECT a.doc_id AS da, b.doc_id AS db FROM keys a JOIN keys b ON a.band$bd = b.band$bd AND a.doc_id < b.doc_id"
        }.mkString(" UNION ")
        s"""WITH RECURSIVE sh AS (SELECT doc_id, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs),
          edges AS ($unions),
          bi AS (SELECT da AS src, db AS dst FROM edges
                 UNION ALL SELECT db, da FROM edges),
          reach AS (SELECT src, dst FROM bi
                    UNION
                    SELECT r.src, b.dst FROM reach r JOIN bi b ON r.dst = b.src)
        SELECT src AS doc_id, least(src, min(dst)) AS component
        FROM reach GROUP BY src"""
      },
    ),

    // ------------------------------------------------------------------
    // Canonical-representative selection (the resolution step AFTER
    // clustering: dedup07 finds near-dup clusters, this picks the survivor
    // and counts the drops): per connected component, keep the member with
    // the most tokens, ties broken by lowest doc_id — both deterministic
    // integers, so the pick is engine-exact. The keeper join is a two-step
    // (component max, then min-id at that max) textually mirrored in the
    // oracle, avoiding struct-max semantics that differ across engines.
    // Scale: everything after the component build is component-sized; the
    // token counts ride the same corpus scan that feeds the signatures.
    GraftQuery(
      "dedup13_canonical",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"),
            TA.tokenCount(col("text")).cast("long").as("n_toks"))
          .transform(graft.core.Caches.persist)
        val banded = bandedKeys(docs.select(col("doc_id"), col("sig")), "doc_id")
        val hubW = Window.partitionBy(col("band"), col("key"))
        val edges = banded
          .withColumn("hub", min(col("doc_id")).over(hubW))
          .filter(col("doc_id") =!= col("hub"))
          .select(col("hub").as("a"), col("doc_id").as("b"))
          .distinct()
        val j = graft.ops.DedupGraph.connectedComponents(edges)
          .select(col("node").as("doc_id"), col("component"))
          .join(docs.select(col("doc_id"), col("n_toks")), Seq("doc_id"))
        val m = j.groupBy(col("component"))
          .agg(count(lit(1)).as("n_members"), max(col("n_toks")).as("keep_toks"))
        val k = j.join(m, Seq("component"))
          .filter(col("n_toks") === col("keep_toks"))
          .groupBy(col("component")).agg(min(col("doc_id")).as("keep_doc"))
        m.join(k, Seq("component"))
          .select(col("component"), col("n_members"), col("keep_doc"),
            col("keep_toks"), (col("n_members") - 1L).as("n_dropped"))
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"SELECT a.doc_id AS da, b.doc_id AS db FROM keys a JOIN keys b ON a.band$bd = b.band$bd AND a.doc_id < b.doc_id"
        }.mkString(" UNION ")
        s"""WITH RECURSIVE sh AS (SELECT doc_id, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs),
          edges AS ($unions),
          bi AS (SELECT da AS src, db AS dst FROM edges
                 UNION ALL SELECT db, da FROM edges),
          reach AS (SELECT src, dst FROM bi
                    UNION
                    SELECT r.src, b.dst FROM reach r JOIN bi b ON r.dst = b.src),
          c AS (SELECT src AS doc_id, least(src, min(dst)) AS component
                FROM reach GROUP BY src),
          q AS (SELECT doc_id, CAST(${TA.Sql.tokenCount("text")} AS BIGINT) AS n_toks
                FROM documents),
          j AS (SELECT c.component, c.doc_id, q.n_toks FROM c JOIN q USING (doc_id)),
          m AS (SELECT component, count(*) AS n_members, max(n_toks) AS keep_toks
                FROM j GROUP BY 1),
          k AS (SELECT j.component, min(j.doc_id) AS keep_doc
                FROM j JOIN m ON j.component = m.component AND j.n_toks = m.keep_toks
                GROUP BY 1)
        SELECT m.component, m.n_members, k.keep_doc, m.keep_toks,
          m.n_members - 1 AS n_dropped
        FROM m JOIN k USING (component)"""
      },
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
          .repartition(s.sparkContext.defaultParallelism)
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
          .repartition(s.sparkContext.defaultParallelism)
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
          .repartition(s.sparkContext.defaultParallelism)
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
    // deterministic hash sampling per stratum: md5-hash of the key → stable
    // 10% sample, identical on every engine/cluster/run (the only sane way
    // to sample 100 TB reproducibly).
    GraftQuery(
      "samp01_hash_sample",
      (s, d) => {
        val bucket = TA.hash60(col("doc_id").cast("string")) % 100
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_total"),
            sum(when(bucket < 10, 1L).otherwise(0L)).as("n_sample"))
          .withColumn("frac", col("n_sample").cast("double") / col("n_total"))
      },
      Some(s"""SELECT lang, count(*) AS n_total,
          CAST(count(*) FILTER (WHERE ${TA.Sql.hash60("CAST(doc_id AS VARCHAR)")} % 100 < 10) AS BIGINT) AS n_sample,
          CAST(count(*) FILTER (WHERE ${TA.Sql.hash60("CAST(doc_id AS VARCHAR)")} % 100 < 10) AS DOUBLE) / count(*) AS frac
        FROM documents GROUP BY lang"""),
    ),

    // ------------------------------------------------------------------
    // PASSAGE-level dedup (C4/RefinedWeb-style boilerplate removal): chunk
    // every document into fixed 8-word passages, hash each, report passages
    // occurring in ≥ 2 distinct documents. One explode + one groupBy —
    // passage hashes are the shuffle keys, so the work is linear in corpus
    // size (never a doc×doc comparison). sequence() guard: Spark's
    // sequence(0, -1) counts DOWN, so short docs need the explicit empty.
    GraftQuery(
      "dedup08_passage",
      (s, d) => {
        val W = 8
        val toks = split(trim(col("text")), "\\s+")
        val nChunks = (size(col("toks")) / W).cast("int")
        val idx = when(nChunks >= 1, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))
        Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"),
            explode(transform(idx,
              i => array_join(slice(col("toks"), i * W + 1, lit(W)), " "))).as("pas"))
          .select(col("doc_id"), TA.hash60(col("pas")).as("pas_hash"))
          .groupBy(col("pas_hash"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"),
            min(col("doc_id")).as("first_doc"))
          .filter(col("n_docs") >= 2)
      },
      Some(s"""WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
        p AS (SELECT doc_id, unnest(list_transform(range(len(toks) // 8),
                i -> array_to_string(list_slice(toks, i*8 + 1, i*8 + 8), ' '))) AS pas
              FROM t),
        h AS (SELECT doc_id, ${TA.Sql.hash60("pas")} AS pas_hash FROM p)
        SELECT pas_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
          min(doc_id) AS first_doc
        FROM h GROUP BY pas_hash HAVING count(DISTINCT doc_id) >= 2"""),
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
          .repartition(s.sparkContext.defaultParallelism)
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
    // Incremental dedup: a NEW batch (doc_id % 10 == 0 — the stand-in for
    // today's crawl) probed against the EXISTING corpus's MinHash band
    // index, then exact-Jaccard-verified on band collisions only. This is
    // the production ingest shape at 100 TB: the corpus index is built once
    // and only the (small) batch is signed and shuffled per arrival —
    // batch×band keys probe the index, the corpus text is touched only for
    // the candidate ids, and nothing is ever all-pairs. Same signature
    // constants as dedup03, same single-division Jaccard as dedup02, so the
    // oracle reproduces candidates AND confirmations exactly.
    GraftQuery(
      "dedup10_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("lang"),
            Dedup.shingleHashesFused(col("text"), Shingle).as("sh"))
          .withColumn("sig", Dedup.minhash(col("sh"), MinhashSeeds))
          .transform(graft.core.Caches.persist) // sign once; both the index and the batch read it
        val idx = docs.filter(col("doc_id") % 10 =!= 0)
        val batch = docs.filter(col("doc_id") % 10 === 0)
        def banded(df: org.apache.spark.sql.DataFrame, id: String) =
          bandedKeys(df.withColumnRenamed("doc_id", id), id)
        val cand = banded(batch, "new_id")
          .join(banded(idx, "old_id"), Seq("band", "key"))
          .select(col("new_id"), col("old_id")).distinct()
          .transform(graft.core.Caches.persist)
        val confirmed = cand
          .join(batch.select(col("doc_id").as("new_id"), col("sh").as("sh_new")), "new_id")
          .join(idx.select(col("doc_id").as("old_id"), col("sh").as("sh_old")), "old_id")
          .filter(Dedup.jaccard(col("sh_new"), col("sh_old")) >= 0.62)
          .select(col("new_id")).distinct()
          .withColumn("is_dup", lit(1))
        val candFlag = cand.select(col("new_id")).distinct()
          .withColumn("is_cand", lit(1))
        batch.select(col("doc_id"), col("lang"))
          .join(candFlag, col("doc_id") === candFlag("new_id"), "left")
          .drop("new_id")
          .join(confirmed, col("doc_id") === confirmed("new_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_batch"),
            count(col("is_cand")).as("n_candidate"),
            count(col("is_dup")).as("n_dup"))
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"""SELECT n.doc_id AS new_id, o.doc_id AS old_id FROM keys n JOIN keys o
            ON n.band$bd = o.band$bd
            WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0"""
        }.mkString(" UNION ")
        val jac = "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))"
        s"""WITH sh AS (SELECT doc_id, lang, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs),
          cand AS ($unions),
          conf AS (SELECT DISTINCT c.new_id FROM cand c
            JOIN sh a ON a.doc_id = c.new_id JOIN sh b ON b.doc_id = c.old_id
            WHERE $jac >= 0.62),
          cd AS (SELECT DISTINCT new_id FROM cand)
        SELECT lang, count(*) AS n_batch,
          count(CASE WHEN doc_id IN (SELECT new_id FROM cd) THEN 1 END) AS n_candidate,
          count(CASE WHEN doc_id IN (SELECT new_id FROM conf) THEN 1 END) AS n_dup
        FROM documents WHERE doc_id % 10 = 0 GROUP BY lang"""
      },
    ),

    // ------------------------------------------------------------------
    // MinHash estimator-accuracy audit: for every LSH candidate pair
    // (dedup03's banding), the signature-estimated Jaccard (matching
    // minima / 16, an exact multiple of 62 500 ppm) against the TRUE
    // shingle Jaccard, bucketed by match count. This is the calibration
    // table that justifies a banding scheme before a 100 TB dedup run —
    // estimator bias/error measured on the corpus itself, per similarity
    // bucket, at ≤17 output rows. Same banded candidate generation as
    // dedup03 (band keys are the shuffle keys, no all-pairs work); the
    // exact-Jaccard join touches candidates only.
    GraftQuery(
      "qc07_minhash_accuracy",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            Dedup.shingleHashesFused(col("text"), Shingle).as("sh"),
            Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"))
          .transform(graft.core.Caches.persist)
        // same hot-bucket cap as dedup03 — plain band self-join when cold
        val pairs = Dedup.bandedPairsCappedOrdered(bandedKeys(docs, "doc_id"),
          "doc_id", JaccardBlockCap)
        val joined = pairs
          .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
            col("sig").as("sig_a")), Seq("doc_a"))
          .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
            col("sig").as("sig_b")), Seq("doc_b"))
        val nMatch = aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v)
        val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
        val scored = joined
          .select(nMatch.as("n_match"), inter.as("inter"),
            (size(col("sh_a")).cast("long") + size(col("sh_b")) - inter).as("un"))
          .select(col("n_match"),
            (col("n_match") * lit(1000000L / MinhashSeeds)).as("est_ppm"),
            when(col("un") === 0, lit(1000000L))
              .otherwise(round(col("inter") * 1000000.0 / col("un")).cast("long"))
              .as("exact_ppm"))
        scored.groupBy(col("n_match"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("exact_ppm")).as("exact_ppm_sum"),
            round(sum(abs(col("est_ppm") - col("exact_ppm"))).cast("double")
              / count(lit(1))).cast("long").as("mean_abs_err_ppm"))
      },
      Some {
        val (sigExprs, bandKeys) = (sqlSigExprs, sqlBandKeys)
        val unions = (0 until Bands).map { bd =>
          s"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM keys a JOIN keys b ON a.band$bd = b.band$bd AND a.doc_id < b.doc_id"
        }.mkString(" UNION ")
        val match16 = (0 until MinhashSeeds).map(i =>
          s"(CASE WHEN x.m$i = y.m$i THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH sh AS (SELECT doc_id, ${sqlShingleHashes("text")} AS s FROM documents),
          sigs AS (SELECT doc_id, s, $sigExprs FROM sh),
          keys AS (SELECT doc_id, $bandKeys FROM sigs),
          pairs AS ($unions),
          m AS (SELECT CAST($match16 AS BIGINT) AS n_match,
              CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS inter,
              CAST(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)) AS BIGINT) AS un
            FROM pairs p JOIN sigs x ON x.doc_id = p.doc_a
              JOIN sigs y ON y.doc_id = p.doc_b),
          t AS (SELECT n_match, n_match * ${1000000L / MinhashSeeds} AS est_ppm,
              CASE WHEN un = 0 THEN 1000000
                ELSE CAST(round(inter * 1000000.0e0 / un) AS BIGINT) END AS exact_ppm
            FROM m)
        SELECT n_match, count(*) AS n_pairs,
          CAST(sum(exact_ppm) AS BIGINT) AS exact_ppm_sum,
          CAST(round(CAST(sum(abs(est_ppm - exact_ppm)) AS DOUBLE) / count(*))
            AS BIGINT) AS mean_abs_err_ppm
        FROM t GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Global boilerplate scrub (C4-style "keep one occurrence"): every
    // non-overlapping 8-token chunk whose exact window occurs in >= 2
    // DISTINCT documents is boilerplate; the lowest-doc_id occurrence
    // keeps it, every other document drops it. Differs from decon03 (an
    // eval-set-driven scrub) in the selection side: the hot-chunk table
    // is built from the corpus ITSELF — one map-side-combinable groupBy
    // on the chunk hash — and is |corpus|/2-bounded, so it joins back by
    // shuffle equi-join on the hash (NOT broadcast: at 100 TB the
    // boilerplate table is itself large; the chunk hash is the shuffle
    // key on both sides, and AQE splits any skewed hash range). The tail
    // (len mod 8 tokens) is always kept, so toks_kept is exact integer
    // arithmetic: n_tokens - 8·n_dropped.
    GraftQuery(
      "dedup14_boilerplate",
      (s, d) => {
        val W = 8
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("toks"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
        // chunking shared with the streaming ingest variant
        // (CorpusStreams.chunkFrequency) — single edit site in Dedup;
        // reuses `docs`' tokenization so documents is scanned ONCE
        val chunks = Dedup.boilerplateChunksTok(
          docs.select(col("doc_id"), col("lang"), col("toks")), W)
        val hot = chunks.groupBy(col("ch"))
          .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("keeper"))
          .filter(col("df") >= 2)
          .select(col("ch"), col("keeper"))
        val marked = chunks.join(hot, Seq("ch"), "left")
          .select(col("doc_id"), col("lang"),
            (col("keeper").isNotNull && col("keeper") =!= col("doc_id")).as("drp"))
        val chunkAgg = marked.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_chunks"),
            count(when(col("drp"), lit(1))).as("n_dropped"),
            countDistinct(when(col("drp"), col("doc_id"))).as("docs_touched"))
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .join(chunkAgg, Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            coalesce(col("docs_touched"), lit(0L)).as("docs_touched"),
            (col("n_tokens") - lit(8L) * coalesce(col("n_dropped"), lit(0L)))
              .as("toks_kept"))
      },
      Some {
        val ck = TA.Sql.hash60("array_to_string(list_slice(toks, j*8 + 1, j*8 + 8), ' ')")
        s"""WITH t AS (SELECT doc_id, lang, ${TA.Sql.tokens("text")} AS toks
              FROM documents),
          ch AS (SELECT doc_id, lang, $ck AS ch
            FROM t, UNNEST(range(len(toks) // 8)) AS u(j)),
          hot AS (SELECT ch, min(doc_id) AS keeper FROM ch GROUP BY ch
            HAVING count(DISTINCT doc_id) >= 2),
          mk AS (SELECT c.doc_id, c.lang,
              h.keeper IS NOT NULL AND h.keeper <> c.doc_id AS drp
            FROM ch c LEFT JOIN hot h ON c.ch = h.ch),
          ca AS (SELECT lang, count(*) AS n_chunks,
              count(*) FILTER (drp) AS n_dropped,
              count(DISTINCT CASE WHEN drp THEN doc_id END) AS docs_touched
            FROM mk GROUP BY 1),
          da AS (SELECT lang, count(*) AS n_docs,
              CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t GROUP BY 1)
        SELECT da.lang, n_docs, n_tokens,
          coalesce(n_chunks, 0) AS n_chunks,
          coalesce(n_dropped, 0) AS n_dropped,
          coalesce(docs_touched, 0) AS docs_touched,
          n_tokens - 8 * coalesce(n_dropped, 0) AS toks_kept
        FROM da LEFT JOIN ca USING (lang)"""
      },
    ),

    // ------------------------------------------------------------------
    // Exact substring dedup (Lee et al., "Deduplicating Training Data
    // Makes Language Models Better", ACL 2022 — the ExactSubstr
    // operator): every OVERLAPPING W-token window (stride 1, vs
    // dedup14's non-overlapping chunks) that appears in >= 2 distinct
    // documents is a duplicated substring; the lowest-doc_id occurrence
    // keeps it and every other document drops its copy. Dropped windows
    // overlap heavily by construction, so per-document they merge into
    // maximal spans (gaps-and-islands over a running max of span ends,
    // the ev18 pattern) and toks_dropped is the UNION length, not
    // W x hits. Scale: the window table is ~n_tokens rows (8x dedup14's),
    // still a pure projection; the hot table is corpus-derived and joins
    // back by window-hash equi-join (NOT broadcast at 100 TB — same call
    // as dedup14; AQE splits skewed hash ranges); the span merge is a
    // per-document window over doc_id partitioning, never global. The
    // suffix-array machinery of the paper exists to find duplicates at
    // BYTE granularity; at fixed token granularity the rolling window +
    // hash groupBy computes the same drop set in two shuffles.
    GraftQuery(
      "dedup15_substring",
      (s, d) => {
        val W = 8
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("toks"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
        val idx = when(size(col("toks")) >= W,
            sequence(lit(0), size(col("toks")) - W))
          .otherwise(array().cast("array<int>"))
        val wins = docs.select(col("doc_id"), col("lang"),
            explode(transform(idx, j => struct(j.as("j"),
              TA.hash60(array_join(slice(col("toks"), j + 1, lit(W)), " ")).as("wh")))).as("w"))
          .select(col("doc_id"), col("lang"), col("w.j").as("j"), col("w.wh").as("wh"))
        val hot = wins.groupBy(col("wh"))
          .agg(countDistinct(col("doc_id")).as("df"), min(col("doc_id")).as("keeper"))
          .filter(col("df") >= 2)
          .select(col("wh"), col("keeper"))
        val spans = wins.join(hot, Seq("wh"))
          .filter(col("keeper") =!= col("doc_id"))
          .select(col("doc_id"), col("lang"), col("j").as("a"), (col("j") + W - 1).as("b"))
        val ws = Window.partitionBy(col("doc_id")).orderBy(col("a"))
        val isl = spans
          .withColumn("runmax",
            max(col("b")).over(ws.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("isl", sum(
            (col("runmax").isNull || col("a") > col("runmax")).cast("int")).over(ws))
        val perDoc = isl
          .groupBy(col("doc_id"), col("lang"), col("isl"))
          .agg((max(col("b")) - min(col("a")) + 1).cast("long").as("dropped"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("dropped")).as("toks_dropped"))
        docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .join(perDoc.groupBy(col("lang"))
              .agg(countDistinct(col("doc_id")).as("docs_touched"),
                sum(col("toks_dropped")).as("toks_dropped")),
            Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            coalesce(col("docs_touched"), lit(0L)).as("docs_touched"),
            coalesce(col("toks_dropped"), lit(0L)).as("toks_dropped"),
            (col("n_tokens") - coalesce(col("toks_dropped"), lit(0L))).as("toks_kept"))
      },
      Some {
        val wk = TA.Sql.hash60("array_to_string(list_slice(toks, j + 1, j + 8), ' ')")
        s"""WITH t AS (SELECT doc_id, lang, ${TA.Sql.tokens("text")} AS toks
              FROM documents),
          w AS (SELECT doc_id, lang, j, $wk AS wh
            FROM t, UNNEST(range(len(toks) - 7)) AS u(j)),
          hot AS (SELECT wh, min(doc_id) AS keeper FROM w GROUP BY wh
            HAVING count(DISTINCT doc_id) >= 2),
          sp AS (SELECT w.doc_id, w.lang, j AS a, j + 7 AS b
            FROM w JOIN hot ON w.wh = hot.wh AND hot.keeper <> w.doc_id),
          im AS (SELECT doc_id, lang, a, b,
              max(b) OVER (PARTITION BY doc_id ORDER BY a
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
            FROM sp),
          isl AS (SELECT doc_id, lang, a, b,
              sum(CASE WHEN runmax IS NULL OR a > runmax THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY a) AS isl
            FROM im),
          pd AS (SELECT doc_id, lang, CAST(sum(dropped) AS BIGINT) AS toks_dropped
            FROM (SELECT doc_id, lang, isl, max(b) - min(a) + 1 AS dropped
                  FROM isl GROUP BY 1, 2, 3) GROUP BY 1, 2),
          da AS (SELECT lang, count(*) AS n_docs,
              CAST(sum(len(toks)) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
          pl AS (SELECT lang, count(DISTINCT doc_id) AS docs_touched,
              CAST(sum(toks_dropped) AS BIGINT) AS toks_dropped FROM pd GROUP BY 1)
        SELECT da.lang, n_docs, n_tokens,
          coalesce(docs_touched, 0) AS docs_touched,
          coalesce(pl.toks_dropped, 0) AS toks_dropped,
          n_tokens - coalesce(pl.toks_dropped, 0) AS toks_kept
        FROM da LEFT JOIN pl USING (lang)"""
      },
    ),

    // ------------------------------------------------------------------
    // Hybrid-retrieval fusion (RRF, k=60): the vector leg is exact-cosine
    // top-10 (sim01's broadcast-query scan) and the lexical leg is
    // token-set-Jaccard top-10 over the SAME id space (embeddings and
    // documents share ids by construction); candidates fuse by reciprocal
    // rank — score = Σ 1/(60+rank) over the lists a candidate appears in,
    // a ONE-addition float (fixed order in both engines) — and the fused
    // top-5 per query is reported with both leg ranks (NULL = candidate
    // missing from that leg). Scale: each leg broadcasts the 10-query
    // side and scans its corpus once; the fusion join and final windows
    // touch only top-10-sized lists. At 100 TB the legs would be the
    // library's index ops (sim02/sim04 for vectors, text10/text12 for
    // lexical) — RRF itself never changes shape: it is list-sized.
    GraftQuery(
      "sim08_rrf_fusion",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        val qv = e.filter(col("id") < 10)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
        val vw = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        val vec = broadcast(qv)
          .crossJoin(e.select(col("id").as("n_id"), col("vec").as("n_vec")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rank_vec", row_number().over(vw))
          .filter(col("rank_vec") <= 10)
          .select(col("q_id"), col("n_id"), col("rank_vec"))
        val t = Tables.documents(s, d)
          .select(col("doc_id").as("id"), array_distinct(TA.tokens(col("text"))).as("tk"))
        val qt = t.filter(col("id") < 10)
          .select(col("id").as("q_id"), col("tk").as("q_tk"))
        val inter = size(array_intersect(col("q_tk"), col("n_tk"))).cast("double")
        val jac = inter / (size(col("q_tk")) + size(col("n_tk")) -
          size(array_intersect(col("q_tk"), col("n_tk"))))
        val lw = Window.partitionBy(col("q_id")).orderBy(col("jac").desc, col("n_id").asc)
        val lex = broadcast(qt)
          .crossJoin(t.select(col("id").as("n_id"), col("tk").as("n_tk")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), jac.as("jac"))
          .withColumn("rank_lex", row_number().over(lw))
          .filter(col("rank_lex") <= 10)
          .select(col("q_id"), col("n_id"), col("rank_lex"))
        val fused = vec.join(lex, Seq("q_id", "n_id"), "full")
          .withColumn("rrf",
            coalesce(lit(1.0) / (col("rank_vec") + 60), lit(0.0)) +
            coalesce(lit(1.0) / (col("rank_lex") + 60), lit(0.0)))
        val fw = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("n_id").asc)
        fused.withColumn("rnk", row_number().over(fw)).filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("rank_vec"), col("rank_lex"),
            col("rrf"), col("rnk"))
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        a AS (SELECT q_id, n_id, rank_vec FROM (
            SELECT q.id AS q_id, c.id AS n_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) DESC, c.id) AS rank_vec
            FROM e q CROSS JOIN e c WHERE q.id < 10 AND c.id <> q.id)
          WHERE rank_vec <= 10),
        t AS (SELECT doc_id AS id,
            list_distinct(regexp_split_to_array(trim(text), '\s+')) AS tk
          FROM documents),
        b AS (SELECT q_id, n_id, rank_lex FROM (
            SELECT q.id AS q_id, c.id AS n_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                CAST(len(list_intersect(q.tk, c.tk)) AS DOUBLE)
                  / (len(q.tk) + len(c.tk) - len(list_intersect(q.tk, c.tk)))
                  DESC, c.id) AS rank_lex
            FROM t q CROSS JOIN t c WHERE q.id < 10 AND c.id <> q.id)
          WHERE rank_lex <= 10),
        f AS (SELECT coalesce(a.q_id, b.q_id) AS q_id,
            coalesce(a.n_id, b.n_id) AS n_id, a.rank_vec, b.rank_lex,
            coalesce(1.0 / (a.rank_vec + 60), 0.0)
              + coalesce(1.0 / (b.rank_lex + 60), 0.0) AS rrf
          FROM a FULL JOIN b ON a.q_id = b.q_id AND a.n_id = b.n_id)
      SELECT q_id, n_id, rank_vec, rank_lex, rrf, rnk FROM (
        SELECT q_id, n_id, rank_vec, rank_lex, rrf,
          row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, n_id) AS rnk
        FROM f) WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // Product quantization (IVF-PQ's compression tier): the 64-dim space
    // splits into 8 subspaces of 8 dims; each subspace's codebook is the
    // sub-slices of the first 16 corpus vectors (deterministic seeds, the
    // sim02 convention); every vector encodes to 8 one-byte codes = 32×
    // smaller than float64 storage. Queries score asymmetrically (ADC):
    // exact query vs reconstructed corpus — numerically IDENTICAL to the
    // LUT formulation, since ADC is by definition the distance to the
    // reconstruction — shortlist top-8 by ADC, then exact-cosine re-rank
    // to top-3. Scale: the codebook (8·16 rows) broadcasts; encode is a
    // broadcast join + one map-side-combinable min_by per (vector,
    // subspace) — the corpus never shuffles on anything but its own id;
    // ADC is the sim01 broadcast-query scan shape. At 100 TB only codes
    // ride the serving path (32× less I/O); the reconstruction here makes
    // the oracle exact without a separate LUT operator.
    GraftQuery(
      "sim07_pq_adc",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .transform(graft.core.Caches.persist)
        val rec = Similarity.pqReconstruct(e, subspaces = 8, subDim = 8, seeds = 16)
        val corpus = rec.join(e, Seq("id"))
          .select(col("id").as("n_id"), col("rvec"), col("vec").as("n_vec"))
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
        val adc = Similarity.dot(col("q_vec"), col("q_vec")) +
          Similarity.dot(col("rvec"), col("rvec")) -
          lit(2.0) * Similarity.dot(col("q_vec"), col("rvec"))
        val sw = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id").asc)
        val short = broadcast(q).crossJoin(corpus)
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), adc.as("adc"), col("q_vec"), col("n_vec"))
          .withColumn("srn", row_number().over(sw)).filter(col("srn") <= 8)
        val rw = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        short.select(col("q_id"), col("n_id"), col("adc"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(rw)).filter(col("rnk") <= 3)
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        $pqSqlCtes,
        corpus AS (SELECT e.id AS n_id, r.rvec, e.v AS n_vec
          FROM rec r JOIN e ON e.id = r.id),
        adc AS (SELECT q.id AS q_id, c.n_id,
            list_dot_product(q.v, q.v) + list_dot_product(c.rvec, c.rvec)
              - 2*list_dot_product(q.v, c.rvec) AS adc,
            q.v AS q_vec, c.n_vec
          FROM e q CROSS JOIN corpus c WHERE q.id < 20 AND q.id <> c.n_id),
        short AS (SELECT q_id, n_id, adc, q_vec, n_vec FROM (
            SELECT q_id, n_id, adc, q_vec, n_vec,
              row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS srn
            FROM adc) WHERE srn <= 8)
      SELECT q_id, n_id, adc, cos, rnk FROM (
        SELECT q_id, n_id, adc,
          list_dot_product(q_vec, n_vec) / (sqrt(list_dot_product(q_vec, q_vec))
            * sqrt(list_dot_product(n_vec, n_vec))) AS cos,
          row_number() OVER (PARTITION BY q_id ORDER BY
            list_dot_product(q_vec, n_vec) / (sqrt(list_dot_product(q_vec, q_vec))
              * sqrt(list_dot_product(n_vec, n_vec))) DESC, n_id) AS rnk
        FROM short) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // sim09: IVF+PQ — the composed billion-scale ANN architecture (the
    // IVFADC design of Jégou et al., "Product Quantization for Nearest
    // Neighbor Search", TPAMI 2011, as deployed in FAISS): sim02's coarse
    // quantizer routes each query to its nprobe=2 nearest cells, sim07's
    // product quantizer compresses every corpus vector to 8 one-byte codes,
    // and the query scores ONLY the probed cells' posting lists by ADC
    // before an exact-cosine re-rank of the shortlist. (PQ here encodes raw
    // vectors, not residuals — the IVF-Flat-PQ variant — so the codebook
    // stage is shared verbatim with sim07 and the oracle stays exact.)
    // Scale: centroids (fixed at 16 deterministic seeds here, the sim02
    // convention; k≈√N is the production-scale sizing) and the 8·16-row
    // codebook broadcast;
    // cell assignment and encode are broadcast joins + one map-side-
    // combinable min_by each; candidate generation is an EQUI-JOIN on
    // cell_id (the corpus is never cross-joined against the query set —
    // each query touches ~nprobe/k of the postings); ADC reads only the
    // 8-byte codes (32× less I/O than float64 vectors at 100 TB); exact
    // vectors re-attach by keyed join for the top-8 shortlist only.
    GraftQuery(
      "sim09_ivfpq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .transform(graft.core.Caches.persist)
        // coarse quantizer: 16 deterministic seed centroids (sim02 shape)
        val cells = Similarity.assignCells(e, e.filter(col("id") < 16))
        // PQ codebook + encode + reconstruct: the single shared stage
        val rec = Similarity.pqReconstruct(e, subspaces = 8, subDim = 8, seeds = 16)
        // inverted lists: cell_id → (n_id, reconstructed vector)
        val posting = cells.select(col("id").as("n_id"), col("cell_id"))
          .join(rec.select(col("id").as("n_id"), col("rvec")), Seq("n_id"))
        // query routing: nprobe=2 best cells by centroid cosine
        val seeds = e.filter(col("id") < 16)
          .select(col("id").as("cell_id"), col("vec").as("cell_vec"))
        val cw = Window.partitionBy(col("q_id"))
          .orderBy(col("c_cos").desc, col("cell_id").asc)
        val routed = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
          .crossJoin(broadcast(seeds))
          .select(col("q_id"), col("q_vec"), col("cell_id"),
            Similarity.cosine(col("q_vec"), col("cell_vec")).as("c_cos"))
          .withColumn("crn", row_number().over(cw)).filter(col("crn") <= 2)
          .select(col("q_id"), col("q_vec"), col("cell_id"))
        // ADC over probed cells only — equi-join, never a corpus cross join
        val adc = Similarity.dot(col("q_vec"), col("q_vec")) +
          Similarity.dot(col("rvec"), col("rvec")) -
          lit(2.0) * Similarity.dot(col("q_vec"), col("rvec"))
        val sw = Window.partitionBy(col("q_id"))
          .orderBy(col("adc").asc, col("n_id").asc)
        val short = broadcast(routed).join(posting, Seq("cell_id"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("q_vec"), adc.as("adc"))
          .withColumn("srn", row_number().over(sw)).filter(col("srn") <= 8)
        // exact re-rank: true vectors re-attach by keyed join (top-8 only)
        val rw = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)
        short.join(e.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
          .select(col("q_id"), col("n_id"), col("adc"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(rw)).filter(col("rnk") <= 3)
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT id AS cell_id, v AS cv FROM e WHERE id < 16),
        assign AS (SELECT id, cell_id FROM (
            SELECT e.id, s.cell_id,
              row_number() OVER (PARTITION BY e.id ORDER BY
                list_dot_product(e.v, s.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS rn
            FROM e CROSS JOIN seeds s) WHERE rn = 1),
        $pqSqlCtes,
        posting AS (SELECT a.id AS n_id, a.cell_id, r.rvec
          FROM assign a JOIN rec r ON r.id = a.id),
        routed AS (SELECT q_id, q_vec, cell_id FROM (
            SELECT q.id AS q_id, q.v AS q_vec, s.cell_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                list_dot_product(q.v, s.cv) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS crn
            FROM e q CROSS JOIN seeds s WHERE q.id < 20) WHERE crn <= 2),
        short AS (SELECT q_id, n_id, adc, q_vec FROM (
            SELECT r.q_id, p.n_id, r.q_vec,
              list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                - 2*list_dot_product(r.q_vec, p.rvec) AS adc,
              row_number() OVER (PARTITION BY r.q_id ORDER BY
                list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                  - 2*list_dot_product(r.q_vec, p.rvec) ASC, p.n_id ASC) AS srn
            FROM routed r JOIN posting p
              ON r.cell_id = p.cell_id AND r.q_id <> p.n_id) WHERE srn <= 8)
      SELECT q_id, n_id, adc, cos, rnk FROM (
        SELECT s.q_id, s.n_id, s.adc,
          list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) AS cos,
          row_number() OVER (PARTITION BY s.q_id ORDER BY
            list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) DESC,
            s.n_id ASC) AS rnk
        FROM short s JOIN e ON e.id = s.n_id) WHERE rnk <= 3"""),
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
  )
}
