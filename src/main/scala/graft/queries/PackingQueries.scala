package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Dedup, Similarity, Sketches, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set PACKAGING operators, split out of CorpusQueries in round
  * 13 (registry hygiene — the pack passed 1300 LoC; query bodies are
  * byte-identical to their pre-split forms): GPT-style sequence packing
  * (pack01), chunking (pack02-04), SFT loss masking (pack05), curriculum
  * staging (pack06), and the preference-data family (pref01-03).
  */
object PackingQueries {

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Training sequence packing (GPT-style concat-and-split): documents are
    // hash-assigned to 16 shards, concatenated in deterministic doc_id order
    // within each shard, and split at a 512-token budget. Per shard:
    // document/token totals, sequence count, and how many documents straddle
    // a sequence boundary. The cumulative sum is a per-shard window — the
    // shuffle key is the shard, so at 100 TB the packing parallelizes by
    // shard count (thousands on a real export) and each shard's running
    // offset is a single partition-local sort, never a global one.
    GraftQuery(
      "pack01_seq_packing",
      (s, d) => {
        val B = 512L
        val base = Tables.documents(s, d).select(
          col("doc_id"),
          (TA.hash60(concat(lit("pack:"), col("doc_id").cast("string"))) % 16).as("shard"),
          TA.tokenCount(col("text")).cast("long").as("n_tok"))
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        base.withColumn("start", coalesce(sum(col("n_tok")).over(w), lit(0L)))
          .groupBy(col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            ceil(sum(col("n_tok")) / lit(B.toDouble)).cast("long").as("n_seqs"),
            count(when(expr(s"start div $B") =!=
              expr(s"(start + n_tok - 1) div $B"), lit(1))).as("n_straddle"))
      },
      Some {
        val h = TA.Sql.hash60("concat('pack:', CAST(doc_id AS VARCHAR))")
        s"""WITH d AS (SELECT doc_id, $h % 16 AS shard,
              ${TA.Sql.tokenCount("text")} AS n_tok FROM documents),
          c AS (SELECT shard, doc_id, n_tok,
              coalesce(CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start
            FROM d)
        SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          CAST(ceil(sum(n_tok) / 512.0) AS BIGINT) AS n_seqs,
          count(CASE WHEN start // 512 <> (start + n_tok - 1) // 512 THEN 1 END) AS n_straddle
        FROM c GROUP BY shard"""
      },
    ),

    // ------------------------------------------------------------------
    // Preference-pair (DPO/RLHF) data prep (round 12): group candidate
    // completions by prompt, take the best- and worst-scored per group as
    // the (chosen, rejected) pair, and audit pair counts, score margins,
    // and an id-derived pair checksum. Prompt groups are (source,
    // doc_id DIV 8); the quality score is an md5-derived 60-bit integer
    // (practically collision-free, so argmax/argmin are deterministic in
    // any engine). Plan shape: ONE shuffle on the group key with
    // map-side-combinable max_by/min_by partials, then the tiny
    // per-source rollup — the grouped-argmax pattern that builds
    // preference datasets at corpus scale.
    GraftQuery(
      "pref01_dpo_pairs",
      (s, d) => {
        val M = 1000000007L
        val scored = Tables.documents(s, d).select(
          col("source"),
          expr("doc_id DIV 8").as("g"),
          col("doc_id"),
          TA.hash60(concat(lit("score:"), col("doc_id").cast("string"))).as("score"))
        val pairs = scored.groupBy(col("source"), col("g"))
          .agg(
            count(lit(1)).as("n_cands"),
            max_by(col("doc_id"), col("score")).as("chosen"),
            min_by(col("doc_id"), col("score")).as("rejected"),
            max(col("score")).as("s_max"),
            min(col("score")).as("s_min"))
        pairs.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_groups"),
            count(when(col("n_cands") >= 2, lit(1))).as("n_pairs"),
            sum(when(col("n_cands") >= 2, (col("s_max") - col("s_min")) % M)
              .otherwise(0L)).as("sum_margin"),
            sum(when(col("n_cands") >= 2,
              (col("chosen") * 31 + col("rejected")) % M).otherwise(0L))
              .as("pair_check"))
      },
      Some {
        val score = TA.Sql.hash60("concat('score:', CAST(doc_id AS VARCHAR))")
        s"""WITH scored AS (SELECT source, doc_id // 8 AS g, doc_id,
              $score AS score FROM documents),
          p AS (SELECT source, g, count(*) AS n_cands,
              max_by(doc_id, score) AS chosen, min_by(doc_id, score) AS rejected,
              max(score) AS s_max, min(score) AS s_min
            FROM scored GROUP BY 1, 2)
        SELECT source, count(*) AS n_groups,
          count(CASE WHEN n_cands >= 2 THEN 1 END) AS n_pairs,
          CAST(sum(CASE WHEN n_cands >= 2 THEN (s_max - s_min) % 1000000007
            ELSE 0 END) AS BIGINT) AS sum_margin,
          CAST(sum(CASE WHEN n_cands >= 2
            THEN (chosen * 31 + rejected) % 1000000007 ELSE 0 END)
            AS BIGINT) AS pair_check
        FROM p GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Bradley-Terry strength fit over preference duels (round 12): the
    // model behind reward-model eval boards and matchup-based data
    // curation. Global prompt groups (doc_id DIV 8) span sources; the
    // best/worst-scored doc per group make one (winner, loser) duel
    // between their SOURCES, the corpus collapses to the |sources|²
    // win matrix in one shuffle, and TWO minorization-maximization
    // rounds (p_i ← W_i / Σ_j n_ij/(p_i+p_j), start p=1) run over that
    // schema-sized matrix on the driver — per-opponent terms are
    // nano-scaled to exact longs before summing so the fit is
    // bit-identical to the oracle's CTE chain regardless of summation
    // order. Scale shape: the 100 TB corpus is touched once (grouped
    // argmax/argmin with map-side-combinable partials); everything
    // after is O(|sources|²).
    GraftQuery(
      "pref02_bradley_terry",
      (s, d) => {
        val scored = Tables.documents(s, d).select(
          expr("doc_id DIV 8").as("g"),
          col("source"),
          TA.hash60(concat(lit("score:"), col("doc_id").cast("string"))).as("score"))
        val duels = scored.groupBy(col("g"))
          .agg(count(lit(1)).as("n_cands"),
            max_by(col("source"), col("score")).as("w"),
            min_by(col("source"), col("score")).as("l"))
          .filter(col("n_cands") >= 2 && col("w") =!= col("l"))
          .groupBy(col("w"), col("l")).agg(count(lit(1)).as("cnt"))
        // the win matrix is |sources|² — schema-sized by construction
        val m: Map[(String, String), Long] = duels.collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val players = m.keysIterator.flatMap(k => Iterator(k._1, k._2)).toSeq.distinct.sorted
        val wins: Map[String, Long] =
          players.map(i => i -> m.iterator.filter(_._1._1 == i).map(_._2).sum).toMap
        val nij: Map[(String, String), Long] = (for {
          i <- players; j <- players if i != j
        } yield (i, j) -> (m.getOrElse((i, j), 0L) + m.getOrElse((j, i), 0L))).toMap
        var p: Map[String, Double] = players.map(_ -> 1.0).toMap
        for (_ <- 0 until 2) {
          p = players.map { i =>
            val si = players.filter(_ != i).map { j =>
              math.round(nij(i -> j).toDouble / (p(i) + p(j)) * 1000000000.0)
            }.sum
            i -> (if (si == 0L) 0.0 else wins(i).toDouble * 1000000000.0 / si)
          }.toMap
        }
        val out = players.map { i =>
          (i, wins(i), players.filter(_ != i).map(j => nij(i -> j)).sum,
            math.round(p(i) * 1000000.0))
        }
        import s.implicits._
        out.toDF("source", "wins", "games", "strength_micro")
      },
      Some {
        val score = TA.Sql.hash60("concat('score:', CAST(doc_id AS VARCHAR))")
        s"""WITH scored AS (SELECT doc_id // 8 AS g, source,
              $score AS score FROM documents),
          duel AS (SELECT g, count(*) AS n_cands,
              max_by(source, score) AS w, min_by(source, score) AS l
            FROM scored GROUP BY 1),
          m AS (SELECT w, l, count(*) AS cnt FROM duel
            WHERE n_cands >= 2 AND w <> l GROUP BY 1, 2),
          wins AS (SELECT w AS i, CAST(sum(cnt) AS BIGINT) AS wi FROM m GROUP BY 1),
          n AS (SELECT i, j, CAST(sum(cnt) AS BIGINT) AS nij FROM
            (SELECT w AS i, l AS j, cnt FROM m
             UNION ALL SELECT l AS i, w AS j, cnt FROM m) GROUP BY 1, 2),
          players AS (SELECT DISTINCT i FROM n),
          p0 AS (SELECT i, 1.0 AS p FROM players),
          s1 AS (SELECT n.i, CAST(sum(CAST(round(nij/(pi.p+pj.p)*1000000000.0)
              AS BIGINT)) AS BIGINT) AS s
            FROM n JOIN p0 pi ON n.i = pi.i JOIN p0 pj ON n.j = pj.i GROUP BY 1),
          p1 AS (SELECT s1.i, CASE WHEN s1.s = 0 THEN 0.0
              ELSE CAST(coalesce(w.wi, 0) AS DOUBLE)*1000000000.0/s1.s END AS p
            FROM s1 LEFT JOIN wins w ON s1.i = w.i),
          s2 AS (SELECT n.i, CAST(sum(CAST(round(nij/(pi.p+pj.p)*1000000000.0)
              AS BIGINT)) AS BIGINT) AS s
            FROM n JOIN p1 pi ON n.i = pi.i JOIN p1 pj ON n.j = pj.i GROUP BY 1),
          p2 AS (SELECT s2.i, CASE WHEN s2.s = 0 THEN 0.0
              ELSE CAST(coalesce(w.wi, 0) AS DOUBLE)*1000000000.0/s2.s END AS p
            FROM s2 LEFT JOIN wins w ON s2.i = w.i)
        SELECT p2.i AS source, CAST(coalesce(w.wi, 0) AS BIGINT) AS wins,
          (SELECT CAST(sum(nij) AS BIGINT) FROM n WHERE n.i = p2.i) AS games,
          CAST(round(p2.p*1000000.0) AS BIGINT) AS strength_micro
        FROM p2 LEFT JOIN wins w ON p2.i = w.i"""
      },
    ),

    // ------------------------------------------------------------------
    // SFT data prep (round 12): the step between a curated corpus and a
    // fine-tuning run — render synthetic chat transcripts (2/4/6
    // alternating user/assistant turns sliced from each doc) through a
    // deterministic chat template and account the LOSS MASK: assistant
    // tokens train, user tokens mask, and the rendered string itself is
    // checksummed so one wrong byte of template assembly breaks the
    // match. Pure codegen'd higher-order functions (sequence/transform/
    // filter/aggregate) over an array-of-structs turn column — no UDF, no
    // shuffle until the per-source aggregate; at 100 TB this is a single
    // projection pass.
    GraftQuery(
      "pack05_sft_loss_mask",
      (s, d) => {
        val M = 1000000007L
        val base = Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .withColumn("n_turns", lit(2) + (col("doc_id") % 3).cast("int") * 2)
          .withColumn("turns",
            transform(sequence(lit(0), col("n_turns") - 1), i =>
              struct(
                when(i % 2 === 0, "user").otherwise("assistant").as("role"),
                col("text").substr((i * 17 % length(col("text")) + 1).cast("int"),
                  (lit(24) + (col("doc_id") + i) % 13).cast("int")).as("txt"))))
          .withColumn("render", concat_ws("",
            transform(col("turns"), t =>
              concat(lit("<|"), t.getField("role"), lit("|>"),
                t.getField("txt"), lit("<|end|>")))))
          .select(
            col("source"),
            aggregate(col("turns"), lit(0L),
              (acc, t) => acc + TA.tokenCount(t.getField("txt")).cast("long"))
              .as("tok_total"),
            aggregate(filter(col("turns"), t => t.getField("role") === "assistant"),
              lit(0L),
              (acc, t) => acc + TA.tokenCount(t.getField("txt")).cast("long"))
              .as("tok_train"),
            (TA.hash60(col("render")) % M).as("render_h"))
        base.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("tok_total")).as("sum_tokens"),
            sum(col("tok_train")).as("sum_trainable"),
            sum(col("tok_total") - col("tok_train")).as("sum_masked"),
            sum(col("render_h")).as("render_check"))
      },
      // turn i slice: substring(text, (17i mod len)+1, 24 + (doc_id+i) mod 13);
      // role alternates user/assistant from user; template
      // <|role|>txt<|end|> concatenated in turn order
      Some(s"""WITH d AS (SELECT doc_id, source, text, length(text) AS len
            FROM documents WHERE length(text) > 0),
          t AS (SELECT doc_id, source,
              list_transform(range(0, 2 + (doc_id % 3) * 2), i -> struct_pack(
                role := CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END,
                txt := substring(text, CAST((i * 17) % len AS INTEGER) + 1,
                  CAST(24 + (doc_id + i) % 13 AS INTEGER)))) AS turns
            FROM d),
          r AS (SELECT source,
              CAST(list_sum(list_transform(turns,
                t -> ${TA.Sql.tokenCount("t.txt")})) AS BIGINT) AS tok_total,
              COALESCE(CAST(list_sum(list_transform(
                list_filter(turns, t -> t.role = 'assistant'),
                t -> ${TA.Sql.tokenCount("t.txt")})) AS BIGINT), 0) AS tok_train,
              (${TA.Sql.hash60("array_to_string(list_transform(turns, " +
        "t -> '<|' || t.role || '|>' || t.txt || '<|end|>'), '')")} % 1000000007)
                AS render_h
            FROM t)
        SELECT source, count(*) AS n_docs,
          CAST(sum(tok_total) AS BIGINT) AS sum_tokens,
          CAST(sum(tok_train) AS BIGINT) AS sum_trainable,
          CAST(sum(tok_total - tok_train) AS BIGINT) AS sum_masked,
          CAST(sum(render_h) AS BIGINT) AS render_check
        FROM r GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // RAG-prep chunking (pack01's retrieval sibling): 128-token windows at
    // stride 96 (32-token overlap). Everything is computed in closed form
    // INSIDE the projection — chunk count by integer division, per-chunk
    // token sums via a higher-order fold over the chunk indices — so the
    // corpus is scanned once with NO explode and the only shuffle is the
    // final 4-row language rollup. Integer arithmetic end-to-end.
    GraftQuery(
      "pack02_chunk_overlap",
      (s, d) => {
        val W = 128L; val St = 96L
        val n = TA.tokenCount(col("text")).cast("long")
        val nc = when(col("n_tok") <= W, lit(1L))
          .otherwise(expr(s"(n_tok - $W + ${St - 1}) DIV $St") + 1L)
        val chunkToks = expr(
          s"aggregate(sequence(0L, n_chunks - 1), 0L, (acc, i) -> acc + least($W, n_tok - $St * i))")
        val fullChunks = expr(
          s"aggregate(sequence(0L, n_chunks - 1), 0L, (acc, i) -> acc + IF(n_tok - $St * i >= $W, 1L, 0L))")
        Tables.documents(s, d)
          .select(col("lang"), n.as("n_tok"))
          .withColumn("n_chunks", nc)
          .withColumn("chunk_toks", chunkToks)
          .withColumn("full_chunks", fullChunks)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            sum(col("n_chunks")).as("n_chunks"),
            sum(col("chunk_toks")).as("n_chunk_tokens"),
            sum(col("full_chunks")).as("n_full_chunks"))
      },
      Some(s"""WITH t AS (SELECT lang, ${TA.Sql.tokenCount("text")} AS n_tok FROM documents),
          c AS (SELECT lang, n_tok,
              CASE WHEN n_tok <= 128 THEN 1 ELSE (n_tok - 128 + 95) // 96 + 1 END AS n_chunks
            FROM t),
          p AS (SELECT lang, n_tok, n_chunks,
              list_sum(list_transform(generate_series(0, n_chunks - 1),
                i -> least(128, n_tok - 96 * i))) AS chunk_toks,
              list_sum(list_transform(generate_series(0, n_chunks - 1),
                i -> CASE WHEN n_tok - 96 * i >= 128 THEN 1 ELSE 0 END)) AS full_chunks
            FROM c)
        SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
          CAST(sum(chunk_toks) AS BIGINT) AS n_chunk_tokens,
          CAST(sum(full_chunks) AS BIGINT) AS n_full_chunks
        FROM p GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Materialized RAG chunk table (the table pack02 only plans): every
    // (doc, window) becomes a row with its token span and a 60-bit
    // CONTENT-ADDRESSED hash of the chunk text — the key a retrieval store
    // dedups and upserts on. W=32 / stride=24 so multi-chunk splitting is
    // actually exercised at test SFs. One projection + one bounded explode
    // (chunks per doc = ceil(tokens/stride), linear in corpus tokens); no
    // shuffle at all — at 100 TB this writes straight to the chunk store.
    GraftQuery(
      "pack03_chunk_table",
      (s, d) => {
        val W = 32; val St = 24
        val toks = TA.tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"), size(toks).cast("long").as("n_tok"))
          .withColumn("n_chunks",
            when(col("n_tok") <= W, lit(1L))
              .otherwise(expr(s"(n_tok - $W + ${St - 1}) DIV $St") + 1L))
        base
          .select(col("doc_id"), col("toks"), col("n_tok"),
            explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
          .select(col("doc_id"), col("toks"), col("chunk_id"),
            (col("chunk_id") * St).as("start_tok"),
            least(lit(W.toLong), col("n_tok") - col("chunk_id") * St).as("chunk_len"))
          .withColumn("chunk_hash", TA.hash60(array_join(
            expr(s"slice(toks, CAST(chunk_id * $St + 1 AS INT), CAST(chunk_len AS INT))"), " ")))
          .drop("toks")
      },
      Some(raw"""WITH t AS (SELECT doc_id,
            regexp_split_to_array(trim(text), '\s+') AS toks,
            CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
          FROM documents),
        c AS (SELECT doc_id, toks, n_tok,
            CASE WHEN n_tok <= 32 THEN 1 ELSE (n_tok - 32 + 23) // 24 + 1 END AS n_chunks
          FROM t),
        x AS (SELECT doc_id, toks, CAST(i AS BIGINT) AS chunk_id,
            CAST(24 * i AS BIGINT) AS start_tok,
            CAST(least(32, n_tok - 24 * i) AS BIGINT) AS chunk_len
          FROM c, UNNEST(generate_series(0, n_chunks - 1)) AS g(i))
        SELECT doc_id, chunk_id, start_tok, chunk_len,
          ${TA.Sql.hash60(
            "array_to_string(toks[CAST(start_tok + 1 AS INT) : CAST(start_tok + chunk_len AS INT)], ' ')")}
            AS chunk_hash
        FROM x"""),
    ),

    // ------------------------------------------------------------------
    // Length-bucketed batching audit: documents bin to the smallest
    // power-of-two token capacity that holds them (the standard bucketing
    // that keeps padding waste bounded when batching variable-length
    // sequences). Per bucket: docs, real tokens, padded slots wasted, and
    // waste ppm — the numbers that decide whether the bucket boundaries
    // need to move. Pure integer arithmetic over one corpus projection +
    // one ≤12-cell groupBy; at 100 TB it's a scan-rate operator.
    GraftQuery(
      "pack04_length_buckets",
      (s, d) => {
        val caps = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
        val n = TA.tokenCount(col("text")).cast("long")
        val cap = caps.foldRight(lit(16384): org.apache.spark.sql.Column) {
          (c, el) => when(n <= c, lit(c)).otherwise(el)
        }
        // beyond the largest capacity a document SPLITS across ceil(n/16384)
        // max-size sequences, so its padded slots are 16384·ceil — waste
        // stays a true non-negative padding count in every bucket
        Tables.documents(s, d)
          .select(cap.as("bin_cap"), n.as("ntok"),
            when(n <= caps.last, cap.cast("long"))
              .otherwise(lit(16384L) * ceil(n.cast("double") / 16384.0).cast("long"))
              .as("slots"))
          .groupBy(col("bin_cap"))
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok_sum"),
            sum(col("slots")).as("slot_sum"))
          .withColumn("waste", col("slot_sum") - col("tok_sum"))
          .withColumn("waste_ppm",
            round(col("waste") * lit(1000000.0) / col("slot_sum")).cast("long"))
          .drop("slot_sum")
      },
      Some {
        val caps = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)
        val chain = caps.map(c => s"WHEN n <= $c THEN $c").mkString(" ")
        s"""WITH t AS (SELECT CASE $chain ELSE 16384 END AS bin_cap, n,
            CASE WHEN n <= ${caps.last} THEN CASE $chain ELSE 16384 END
              ELSE 16384 * CAST(ceil(n / 16384.0e0) AS BIGINT) END AS slots
          FROM (SELECT ${TA.Sql.tokenCount("text")} AS n FROM documents)),
          g AS (SELECT bin_cap, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tok_sum,
              CAST(sum(slots) AS BIGINT) AS slot_sum
            FROM t GROUP BY 1)
        SELECT bin_cap, n_docs, tok_sum, slot_sum - tok_sum AS waste,
          CAST(round((slot_sum - tok_sum) * 1000000.0e0 / slot_sum) AS BIGINT)
            AS waste_ppm
        FROM g"""
      },
    ),

    // ------------------------------------------------------------------
    // Curriculum staging (round 12): quantile-binned difficulty stages —
    // per source, rank documents by token count (ties by doc_id for a
    // total order) and cut into 4 equal-frequency stages with ntile (the
    // standard short-to-long curriculum a pre-training run feeds in
    // order). Differs from pack04's FIXED length buckets: boundaries
    // here are data-dependent order statistics. The per-(source, stage)
    // manifest pins counts, token budgets, and the stage's exact token
    // range. Scale shape: windows partition by source (parallel across
    // the corpus's natural key), then a schema-sized rollup; a skewed
    // giant source is the documented limit (one partition's sort).
    GraftQuery(
      "pack06_curriculum",
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("tok").asc, col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            size(TA.tokens(col("text"))).cast("long").as("tok"))
          .withColumn("stage", ntile(4).over(w))
          .groupBy(col("source"), col("stage"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("tok")).as("tok_sum"),
            min(col("tok")).as("tok_min"),
            max(col("tok")).as("tok_max"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
            CAST(${TA.Sql.tokenCount("text")} AS BIGINT) AS tok
          FROM documents),
        st AS (SELECT source, tok,
            ntile(4) OVER (PARTITION BY source
              ORDER BY tok ASC, doc_id ASC) AS stage
          FROM t)
        SELECT source, stage, count(*) AS n_docs,
          CAST(sum(tok) AS BIGINT) AS tok_sum,
          CAST(min(tok) AS BIGINT) AS tok_min,
          CAST(max(tok) AS BIGINT) AS tok_max
        FROM st GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // Best-of-n rejection sampling (round 12): the RFT/STaR data-prep
    // op — per candidate group (source, doc_id DIV 4), keep the argmax-
    // scored completion ONLY if it clears the acceptance threshold, and
    // audit per source: group count, acceptance rate numerator, kept
    // token budget, and a kept-id checksum. The score is an md5-derived
    // 60-bit integer (deterministic argmax in any engine); the threshold
    // keeps ~60% of groups. Same one-shuffle grouped-argmax shape as
    // pref01 with the accept/reject audit a rejection-sampling run
    // actually reports.
    GraftQuery(
      "pref03_rejection_sampling",
      (s, d) => {
        val M = 1000000007L
        val T = 922000000000000000L // ~0.8 of the 60-bit score space (keeps ~1-0.8^4 = 59% of 4-groups)
        val scored = Tables.documents(s, d).select(
          col("source"),
          expr("doc_id DIV 4").as("g"),
          col("doc_id"),
          size(TA.tokens(col("text"))).cast("long").as("tok"),
          TA.hash60(concat(lit("rs:"), col("doc_id").cast("string"))).as("score"))
        val best = scored.groupBy(col("source"), col("g"))
          .agg(
            count(lit(1)).as("n_cands"),
            max(col("score")).as("s_best"),
            max_by(col("doc_id"), col("score")).as("kept_id"),
            max_by(col("tok"), col("score")).as("kept_tok"))
        best.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_groups"),
            count(when(col("s_best") >= T, lit(1))).as("n_accepted"),
            sum(when(col("s_best") >= T, col("kept_tok")).otherwise(0L))
              .as("kept_tokens"),
            sum(when(col("s_best") >= T, col("kept_id") % M).otherwise(0L))
              .as("kept_check"))
      },
      Some {
        val score = TA.Sql.hash60("concat('rs:', CAST(doc_id AS VARCHAR))")
        s"""WITH scored AS (SELECT source, doc_id // 4 AS g, doc_id,
              CAST(${TA.Sql.tokenCount("text")} AS BIGINT) AS tok,
              $score AS score FROM documents),
          b AS (SELECT source, g, count(*) AS n_cands,
              max(score) AS s_best,
              max_by(doc_id, score) AS kept_id,
              max_by(tok, score) AS kept_tok
            FROM scored GROUP BY 1, 2)
        SELECT source, count(*) AS n_groups,
          count(CASE WHEN s_best >= 922000000000000000 THEN 1 END)
            AS n_accepted,
          CAST(sum(CASE WHEN s_best >= 922000000000000000
            THEN kept_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
          CAST(sum(CASE WHEN s_best >= 922000000000000000
            THEN kept_id % 1000000007 ELSE 0 END) AS BIGINT) AS kept_check
        FROM b GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Fill-in-the-middle transformation (round 13): the PSM rearrangement
    // code-pretraining pipelines apply — a hash-selected half of the
    // corpus is split prefix/middle/suffix at thirds and re-emitted as
    // <PRE>prefix<SUF>suffix<MID>middle, the rest passes through. Pure
    // per-row string arithmetic (substring indices are identical in both
    // engines), shuffle-free until the source rollup; the checksum pins
    // the exact transformed bytes.
    GraftQuery(
      "pack07_fim",
      (s, d) => {
        val M = 1000000007L
        // integer cut points at thirds (`div`, matching DuckDB's `//`)
        val fim = concat(
          lit("<PRE>"), expr("substring(text, 1, length(text) div 3)"),
          lit("<SUF>"), expr("substring(text, length(text)*2 div 3 + 1)"),
          lit("<MID>"), expr(
            "substring(text, length(text) div 3 + 1, length(text)*2 div 3 - length(text) div 3)"))
        val pick = TA.hash60(concat(lit("fim:"), col("doc_id").cast("string"))) % 2 === 0
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            when(pick, fim).otherwise(col("text")).as("out"),
            pick.cast("long").as("is_fim"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("is_fim")).as("n_fim"),
            sum(length(col("out"))).as("out_chars"),
            sum(TA.hash60(col("out")) % M).as("out_check"))
      },
      Some(s"""WITH t AS (
          SELECT source, doc_id, text, length(text) AS len,
            CASE WHEN ${TA.Sql.hash60("'fim:' || CAST(doc_id AS VARCHAR)")} % 2 = 0
              THEN 1 ELSE 0 END AS is_fim
          FROM documents),
        o AS (
          SELECT source, is_fim,
            CASE WHEN is_fim = 1 THEN
              '<PRE>' || substring(text, 1, len // 3) ||
              '<SUF>' || substring(text, len * 2 // 3 + 1) ||
              '<MID>' || substring(text, len // 3 + 1, len * 2 // 3 - len // 3)
            ELSE text END AS out
          FROM t)
        SELECT source, count(*) AS n_docs,
          CAST(sum(is_fim) AS BIGINT) AS n_fim,
          CAST(sum(length(out)) AS BIGINT) AS out_chars,
          CAST(sum(${TA.Sql.hash60("out")} % 1000000007) AS BIGINT) AS out_check
        FROM o GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // T5-style span corruption (round 14): the denoising objective's data
    // prep — length-2 token spans starting at every position ≡ doc_id%8
    // (mod 8) are replaced by numbered sentinels in the INPUT, and the
    // TARGET is the sentinel-prefixed dropped spans, exactly the
    // (inputs, targets) pair of the original objective. Sentinel k and
    // span start are pure arithmetic (k = start DIV 8), so both sides
    // build the strings with the same integer lambdas — Spark
    // transform/filter/sequence, DuckDB list_transform/list_filter/range
    // — and the checksums must agree byte-for-byte. Scale: per-row
    // projection (whole-stage codegen, no UDF), shuffle-free to the
    // per-source rollup.
    GraftQuery(
      "pack08_span_corruption",
      (s, d) => {
        val M = 1000000007L
        val base = Tables.documents(s, d)
          .filter(length(trim(col("text"))) > 0)
          .select(col("source"), TA.tokens(col("text")).as("toks"),
            (col("doc_id") % 8).cast("int").as("r"))
          .withColumn("n", size(col("toks")))
        val out = base.select(
          col("source"),
          expr("""array_join(filter(transform(toks, (t, i) ->
              CASE WHEN i % 8 = r THEN concat('<extra_id_', CAST(i DIV 8 AS STRING), '>')
                   WHEN i % 8 = (r + 1) % 8 AND i > 0 THEN CAST(NULL AS STRING)
                   ELSE t END), x -> x IS NOT NULL), ' ')""").as("input"),
          expr("""CASE WHEN n > r THEN array_join(transform(
                sequence(0, CAST((n - 1 - r) DIV 8 AS INT)), k ->
                concat('<extra_id_', CAST(k AS STRING), '> ',
                  element_at(toks, 8 * k + r + 1),
                  CASE WHEN 8 * k + r + 1 < n
                    THEN concat(' ', element_at(toks, 8 * k + r + 2))
                    ELSE '' END)), ' ')
            ELSE '' END""").as("target"),
          expr("CASE WHEN n > r THEN (n - 1 - r) DIV 8 + 1 ELSE 0 END")
            .cast("long").as("n_spans"))
        out.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_spans")).as("n_spans"),
          sum(TA.hash60(col("input")) % M).as("input_check"),
          sum(TA.hash60(col("target")) % M).as("target_check"))
      },
      Some(s"""WITH t AS (SELECT source,
            ${TA.Sql.tokens("text")} AS toks,
            CAST(doc_id % 8 AS INT) AS r
          FROM documents WHERE length(trim(text)) > 0),
        x AS (SELECT source, r, toks, len(toks) AS n FROM t),
        o AS (SELECT source,
            array_to_string(list_filter(list_transform(range(0, n), i ->
              CASE WHEN i % 8 = r THEN '<extra_id_' || CAST(i // 8 AS VARCHAR) || '>'
                   WHEN i % 8 = (r + 1) % 8 AND i > 0 THEN NULL
                   ELSE toks[CAST(i + 1 AS INT)] END), y -> y IS NOT NULL), ' ') AS input,
            CASE WHEN n > r THEN array_to_string(list_transform(
                range(0, (n - 1 - r) // 8 + 1), k ->
                '<extra_id_' || CAST(k AS VARCHAR) || '> '
                  || toks[CAST(8 * k + r + 1 AS INT)]
                  || CASE WHEN 8 * k + r + 1 < n
                    THEN ' ' || toks[CAST(8 * k + r + 2 AS INT)]
                    ELSE '' END), ' ')
              ELSE '' END AS target,
            CASE WHEN n > r THEN (n - 1 - r) // 8 + 1 ELSE 0 END AS n_spans
          FROM x)
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_spans) AS BIGINT) AS n_spans,
          CAST(sum(${TA.Sql.hash60("input")} % 1000000007) AS BIGINT) AS input_check,
          CAST(sum(${TA.Sql.hash60("target")} % 1000000007) AS BIGINT) AS target_check
        FROM o GROUP BY 1"""),
    ),
  )
}
