package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Dedup, DedupGraph, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (exact → MinHash-LSH → SimHash → embedding →
  * containment → boilerplate → substring tiers) over the documents and
  * embeddings tables, each with an exact DuckDB oracle: hashes are
  * md5-prefix integers and vector math is double-cast sequential
  * accumulation, both verified bit-identical across engines. The media,
  * text-analysis, and similarity families that used to live here moved to
  * MediaQueries / TextQueries / SimQueries in round 9 (registry hygiene,
  * no behavior change).
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

  // dedup02's all-pairs cap FLOOR: the effective cap is
  // max(floor, 8·√(N/B)) computed inside Dedup.jaccardPairsBlocked, so
  // aggregate all-pairs work stays linear in corpus size while every test
  // SF (max block 112) keeps the exact all-pairs plan byte-identical.
  private val JaccardBlockFloor = 512

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

  val all: Seq[GraftQuery] = Seq(

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
    // pairwise n-gram Jaccard within (lang, source) blocks, with the
    // CORPUS-SCALED fan-out cap (round 11): blocks beyond
    // max(floor, 8·√(N/B)) rows route through LSH star candidates instead
    // of all-pairs (Dedup.jaccardPairsBlocked), so aggregate all-pairs
    // work stays ≤ 64·N — linear by construction. Under the floor (all
    // test SFs — documents tops out at 112/block) the result is EXACTLY
    // the all-pairs oracle below; ScaleStressSpec pins the capped path's
    // bounded fan-out on a synthetic hot block, and the round-11 ×100
    // measurement (BASELINE.md) is the motivating failure: the fixed
    // 4096-cap form ran 835× on 100× data.
    GraftQuery(
      "dedup02_ngram_jaccard",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .transform(graft.core.Par.spread)
          .select(
          col("doc_id"), col("lang"), col("source"),
          Dedup.shingleHashesFused(col("text"), Shingle).as("sh"))
          .transform(graft.core.Caches.persist) // shingle once; both join sides + no optimizer re-inline
        Dedup.jaccardPairsBlocked(docs, Seq("lang", "source"), 0.62,
          JaccardBlockFloor, MinhashSeeds, Bands, RowsPerBand)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.byKey(_, col("doc_a")))
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
          .transform(graft.core.Par.byKey(_, col("doc_b")))
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
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
          .transform(graft.core.Par.spread)
          .select(col("doc_id"),
            Dedup.shingleHashesFused(col("text"), Shingle).as("sh"),
            Dedup.minhashSig(col("text"), Shingle, MinhashSeeds).as("sig"))
          .transform(graft.core.Caches.persist)
        // same hot-bucket cap as dedup03 — plain band self-join when cold
        val pairs = Dedup.bandedPairsCappedOrdered(bandedKeys(docs, "doc_id"),
          "doc_id", JaccardBlockCap)
        val joined = pairs
          .transform(graft.core.Par.byKey(_, col("doc_a")))
          .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
            col("sig").as("sig_a")), Seq("doc_a"))
          .transform(graft.core.Par.byKey(_, col("doc_b")))
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
  )
}
