package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Dedup, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Production-pipeline operators a large-scale data platform runs daily on
  * top of the core engine: event-funnel and cohort-retention analytics, CDC
  * snapshot diffing, referential-integrity QC, per-domain corpus caps, BM25
  * retrieval, blocked edit-distance fuzzy matching, and small-file
  * compaction planning. All beyond the reference's scope; every one keeps
  * the suite's determinism contract (integer arithmetic, micro-rounded
  * single-ordered float expressions, md5-derived priorities) so the DuckDB
  * oracle reproduces the results hash-exactly.
  */
object PipelineQueries {

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** BPE trainer shared by vocab01 (emits the merge table) and vocab02
    * (encodes the corpus with the final vocabulary): the corpus-scale stage
    * is ONE token-frequency aggregate; the 3 greedy merge iterations then
    * run on the vocabulary-sized word table. Returns (merge rows
    * `it|pair|cnt`, final `token|freq|seq` frame after all merges).
    */
  /** Part co-purchase edge set (orders as baskets, support >= 2) — the
    * graph base shared by graph02 (triangles) and graph03 (label
    * propagation); pair generation is order-local (schema-bounded <= 7
    * lines), so it is linear in lineitem, never all-pairs.
    */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // per-order part SETS + in-row pair expansion (the assoc01/graph02
    // shape, round 11): ONE corpus shuffle (collect_set partial-aggregates
    // and dedups map-side) instead of distinct + a self-join's two
    // exchanges; baskets are schema-bounded (≤7 lines), so the in-row
    // fan-out is the pair count itself. Sorted sets yield u<v directly.
    val adj = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
    val ps = col("ps")
    val pairs = flatten(transform(ps, (a, i) =>
      transform(slice(ps, i + 2, greatest(size(ps) - i - 1, lit(0))),
        b => struct(a.as("u"), b.as("v")))))
    adj.select(explode(pairs).as("x"))
      .groupBy(col("x.u").as("u"), col("x.v").as("v"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("u"), col("v"))
  }

  /** DuckDB mirror of [[copurchaseEdges]] (CTEs `li`, `e`). */
  private val sqlCopurchaseEdges: String =
    """li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
          e AS (SELECT a.p AS u, b.p AS v FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2 HAVING count(*) >= 2)"""

  private def bpeTrain(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val words = Tables.documents(s, d)
      .select(explode(TA.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
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
  private val sqlBpeChain: String = raw"""words AS (
          SELECT token, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents)
          WHERE token <> '' GROUP BY 1),
        s0 AS (SELECT token, freq,
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

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Windowed conversion funnel: signup → first click within 24 h → first
    // purchase within 24 h of that click. Each stage is a keyed min-aggregate
    // joined back on user_id, so the user_id shuffle partitioning is REUSED
    // across stages; stage frames shrink monotonically (150 → 65 → 29 at
    // sf0.01) and AQE broadcasts the later stage dims at scale. No windows,
    // no per-user event sorting — at 100 TB the events table is scanned
    // once per stage filter with column pruning down to (user_id, ts).
    GraftQuery(
      "ev14_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val sg = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
        val ck = ev.filter(col("event_type") === "click")
          .join(sg, "user_id")
          .filter(col("ts") >= col("s_ts") &&
            col("ts") <= col("s_ts") + expr("INTERVAL 24 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(ck, "user_id")
          .filter(col("ts") >= col("c_ts") &&
            col("ts") <= col("c_ts") + expr("INTERVAL 24 HOURS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        sg.agg(count(lit(1)).as("users")).select(lit("signup").as("stage"), col("users"))
          .unionAll(ck.agg(count(lit(1)).as("users"))
            .select(lit("click").as("stage"), col("users")))
          .unionAll(pu.agg(count(lit(1)).as("users"))
            .select(lit("purchase").as("stage"), col("users")))
      },
      Some("""WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY 1),
          c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'click' AND e.ts >= s.s_ts
              AND e.ts <= s.s_ts + INTERVAL 24 HOUR GROUP BY 1),
          p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
              AND e.ts <= c.c_ts + INTERVAL 24 HOUR GROUP BY 1)
        SELECT 'signup' AS stage, count(*) AS users FROM s
        UNION ALL SELECT 'click', count(*) FROM c
        UNION ALL SELECT 'purchase', count(*) FROM p"""),
    ),

    // ------------------------------------------------------------------
    // Cohort retention: users bucketed by first-activity week, counted per
    // (cohort_week, week_offset) of later activity. Two keyed aggregations
    // on user_id (first-seen + distinct activity days) — both partial-agg
    // map-side; the distinct-day frame is bounded by users × days, not by
    // raw events. Weeks are epoch-floor integer divisions (both engines
    // floor positive ints identically).
    GraftQuery(
      "ev15_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"))
        val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        val active = ev.distinct()
        active.join(cohort, "user_id")
          .groupBy(
            expr("datediff(cohort_day, DATE '1970-01-01') DIV 7").as("cohort_week"),
            expr("datediff(day, cohort_day) DIV 7").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("users"))
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY 1),
          a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        SELECT date_diff('day', DATE '1970-01-01', cohort_day) // 7 AS cohort_week,
          date_diff('day', cohort_day, day) // 7 AS week_offset,
          count(DISTINCT a.user_id) AS users
        FROM a JOIN f USING (user_id) GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // CDC snapshot diff: classify every business key across two table
    // versions as insert / delete / update / same. The "new" snapshot is a
    // deterministic mutation of customer (drop keys %13, bump balances %7,
    // insert shifted keys %11) so the diff is reproducible. One full-outer
    // hash join on the key — the canonical incremental-load validation at
    // scale; balances compare in exact integer cents.
    GraftQuery(
      "etl14_cdc_diff",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val cents = round(col("c_acctbal") * 100).cast("long")
        val old = cust.select(col("c_custkey").as("ok"), cents.as("obal"))
        // insert keys shift by max(custkey)+1 — PROVABLY disjoint from the
        // live keyspace at any SF (a fixed offset collides once custkeys
        // grow past it, double-classifying the colliding key in BOTH
        // engines — invisible to the oracle gate)
        val shift = broadcast(cust.agg((max(col("c_custkey")) + 1).as("shift")))
        val neu = cust.filter(col("c_custkey") % 13 =!= 0)
          .select(col("c_custkey").as("nk"),
            (cents + when(col("c_custkey") % 7 === 0, 1000L).otherwise(0L)).as("nbal"))
          .unionAll(cust.filter(col("c_custkey") % 11 === 0).crossJoin(shift)
            .select((col("c_custkey") + col("shift")).as("nk"), lit(99900L).as("nbal")))
        old.join(neu, col("ok") === col("nk"), "full_outer")
          .select(
            when(col("ok").isNull, "insert")
              .when(col("nk").isNull, "delete")
              .when(col("obal") =!= col("nbal"), "update")
              .otherwise("same").as("op"),
            coalesce(col("ok"), col("nk")).as("k"))
          .groupBy(col("op"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
      },
      Some("""WITH old AS (SELECT c_custkey AS k,
            CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer),
          newt AS (
            SELECT c_custkey AS k, CAST(round(c_acctbal*100) AS BIGINT) +
              CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END AS bal
            FROM customer WHERE c_custkey % 13 <> 0
            UNION ALL
            SELECT c_custkey + (SELECT max(c_custkey) + 1 FROM customer) AS k,
              99900 AS bal
            FROM customer WHERE c_custkey % 11 = 0)
        SELECT CASE WHEN o.k IS NULL THEN 'insert' WHEN n.k IS NULL THEN 'delete'
            WHEN o.bal <> n.bal THEN 'update' ELSE 'same' END AS op,
          count(*) AS n, CAST(sum(coalesce(o.k, n.k)) AS BIGINT) AS key_sum
        FROM old o FULL OUTER JOIN newt n ON o.k = n.k GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Incremental aggregate maintenance: the stored per-customer totals
    // (orders before the 1999 cutoff — the long history) merge with the new
    // batch's partial aggregate (orders after) into refreshed totals. The
    // incremental plan touches O(history-state + delta), never rescans the
    // raw history — the foundation of every daily-refresh pipeline at
    // 100 TB — and both layers aggregate in exact integer cents, so the
    // merged result is REQUIRED to equal the DuckDB oracle's from-scratch
    // full recompute (that equality is the whole correctness claim).
    GraftQuery(
      "etl15_incremental_agg",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val cutoff = lit("1999-01-01").cast("date")
        def partials(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
        val history = partials(orders.filter(col("o_orderdate") < cutoff))
        val delta = partials(orders.filter(col("o_orderdate") >= cutoff))
        history.unionAll(delta)
          .groupBy(col("o_custkey"))
          .agg(sum(col("n_orders")).as("n_orders"),
            sum(col("total_cents")).as("total_cents"))
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Referential-integrity QC: orphaned orders after a simulated parent
    // purge (customers %50 "deleted"). LEFT ANTI join — the fact side scans
    // once with pruned columns; at 100 TB the live-parent key set rides a
    // bloom pre-filter (sketch03 pattern) so only candidate orphans reach
    // the anti-join shuffle. o_custkey is never NULL here, so ANTI ≡ NOT IN.
    GraftQuery(
      "qc03_referential",
      (s, d) => {
        val live = Tables.customer(s, d)
          .filter(col("c_custkey") % 50 =!= 0).select(col("c_custkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .join(live, col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("orphans"), sum(col("o_orderkey")).as("key_sum"))
      },
      Some("""WITH live AS (SELECT c_custkey FROM customer WHERE c_custkey % 50 <> 0)
        SELECT o_orderstatus, count(*) AS orphans,
          CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM live)
        GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Per-domain corpus cap: keep at most 20 documents per source, chosen
    // by deterministic md5 priority (salted hash60 of the doc id) — the
    // standard web-crawl rebalance that stops one domain from dominating a
    // training mix. One shuffle on source; the window is a per-domain top-K
    // (bounded state per group at any scale).
    GraftQuery(
      "samp04_domain_cap",
      (s, d) => {
        val pri = TA.hash60(concat(lit("cap:"), col("doc_id").cast("string")))
        val w = Window.partitionBy(col("source")).orderBy(pri.asc, col("doc_id").asc)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("kept"), sum(col("doc_id")).as("id_sum"))
      },
      Some(s"""SELECT source, count(*) AS kept,
          CAST(sum(doc_id) AS BIGINT) AS id_sum FROM (
          SELECT source, doc_id, row_number() OVER (PARTITION BY source
            ORDER BY ${TA.Sql.hash60("'cap:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
          FROM documents) WHERE rn <= 20 GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Balanced class downsampling: every language keeps exactly the
    // smallest language's document count, chosen by deterministic md5
    // priority — the class-rebalance step before training a classifier.
    // The min-class size is a 1-row broadcast; the keep decision is one
    // per-language top-K window.
    GraftQuery(
      "samp05_balanced",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val minN = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .agg(min(col("n")).as("n_min"))
        val pri = TA.hash60(concat(lit("bal:"), col("doc_id").cast("string")))
        val w = Window.partitionBy(col("lang")).orderBy(pri.asc, col("doc_id").asc)
        docs.select(col("lang"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .crossJoin(broadcast(minN))
          .filter(col("rn") <= col("n_min"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("kept"), sum(col("doc_id")).as("id_sum"))
      },
      Some(s"""WITH n AS (SELECT min(cnt) AS n_min FROM
            (SELECT count(*) AS cnt FROM documents GROUP BY lang)),
          r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
              ORDER BY ${TA.Sql.hash60("'bal:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
            FROM documents)
        SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM r CROSS JOIN n WHERE rn <= n_min GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // BM25 retrieval (k1=1.2, b=0.75): top-5 documents per query over the
    // corpus. The query set is tiny and BROADCASTS onto the term-frequency
    // frame, so only terms that appear in some query survive past the first
    // join — the corpus shuffles once on term to build df (vocabulary-sized)
    // and once on doc to sum scores. Per-term partial scores are rounded to
    // integer micro-units (identical double expression trees in both
    // engines, DuckDB float literals pinned to DOUBLE with e0), so the final
    // sum is an order-independent integer.
    GraftQuery(
      "text10_bm25",
      (s, d) => {
        import s.implicits._
        val queries = Seq(
          (1, "hash"), (1, "join"),
          (2, "stream"), (2, "window"), (2, "agg"),
          (3, "scan"), (3, "filter"), (3, "column"),
        ).toDF("qid", "term")
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val df = toks.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val st = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tl"))
        val idf = log(lit(1.0) +
          (col("nd").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val tfn = (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl") * col("nd")) / col("tl")))
        val scored = tf.join(broadcast(queries), "term")
          .join(df, "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(st))
          .select(col("qid"), col("doc_id"),
            round(idf * tfn * lit(1000000.0)).cast("long").as("tsc"))
          .groupBy(col("qid"), col("doc_id")).agg(sum(col("tsc")).as("score_micro"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("score_micro").desc, col("doc_id").asc)
        scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      },
      Some(s"""WITH q(qid, term) AS (VALUES (1,'hash'),(1,'join'),
            (2,'stream'),(2,'window'),(2,'agg'),(3,'scan'),(3,'filter'),(3,'column')),
          toks AS (SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
          dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
          df AS (SELECT term, count(*) AS df FROM
            (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
          st AS (SELECT count(*) AS nd, sum(dl) AS tl FROM dl),
          sc AS (SELECT q.qid, tf.doc_id,
              CAST(round(ln(1.0e0 + (CAST(nd AS DOUBLE) - df + 0.5e0) / (df + 0.5e0)) *
                ((tf * 2.2e0) / (tf + 1.2e0 * (0.25e0 + (0.75e0 * dl * nd) / tl))) *
                1000000.0e0) AS BIGINT) AS tsc
            FROM q JOIN tf ON q.term = tf.term JOIN df ON q.term = df.term
            JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
          agg AS (SELECT qid, doc_id,
            CAST(sum(tsc) AS BIGINT) AS score_micro FROM sc GROUP BY 1, 2)
        SELECT qid, doc_id, score_micro, rnk FROM (
          SELECT qid, doc_id, score_micro, row_number() OVER (PARTITION BY qid
            ORDER BY score_micro DESC, doc_id) AS rnk FROM agg) WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // Blocked fuzzy matching: edit distance ≤ 30 on 40-char prefixes within
    // (lang, source, 20-char length band) blocks — the record-linkage shape
    // (near-identical titles/headers) that exact and shingle dedup both
    // miss. Blocking keys keep the equi-join linear in block size; the
    // levenshtein DP runs only on post-join candidates and only over fixed
    // 40-char prefixes (O(1600) per pair, not O(doc²)). Blocks over the cap
    // get an extra 8-char-prefix refinement key (Dedup.fuzzyPairsBlocked) —
    // bounded fan-out on a 100 TB hot block, plan byte-identical to the
    // plain self-join below it (all test SFs; ScaleStressSpec pins the
    // capped path). Like dedup02, the oracle below models the UNCAPPED
    // all-pairs semantics: the correctness contract is that no block
    // exceeds the cap at verification SFs (max block ≈ 11 rows at sf0.1
    // vs threshold 4000); above the cap the operator intentionally trades
    // recall for boundedness and the oracle no longer applies.
    GraftQuery(
      "dedup11_fuzzy",
      (s, d) => {
        val pre = Tables.documents(s, d).select(
          col("doc_id"), col("lang"), col("source"),
          expr("n_chars DIV 20").as("lb"),
          substring(col("text"), 1, 40).as("pre"))
        Dedup.fuzzyPairsBlocked(pre, Seq("lang", "source", "lb"), "pre",
          maxDist = 30, threshold = 4000, refineLen = 8)
      },
      Some("""WITH d AS (SELECT doc_id, lang, source, n_chars // 20 AS lb,
            substr(text, 1, 40) AS pre FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          levenshtein(a.pre, b.pre) AS dist
        FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
          AND a.lb = b.lb AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pre, b.pre) <= 30"""),
    ),

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
    // Inverted-index build (the retrieval companion of text10's BM25): per
    // term, document frequency and the head of the doc_id-sorted posting
    // list. BOUNDED aggregation state: the posting head is a per-term top-K
    // window (row_number ≤ 20), never a full collect_list over the corpus —
    // at 100 TB the full index is the sort-based path (range-repartition on
    // term, sortWithinPartitions, write runs); this query materializes the
    // df stats plus the head-20 postings both aggs sharing one term shuffle.
    GraftQuery(
      "text12_inverted_index",
      (s, d) => {
        val pairs = Tables.documents(s, d)
          .select(col("doc_id"), explode(TA.tokens(col("text"))).as("term"))
          .distinct()
        val df = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
        val head = pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .groupBy(col("term"))
          .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
        df.join(head, "term")
      },
      Some(s"""WITH pairs AS (SELECT DISTINCT doc_id, term FROM
            (SELECT doc_id, unnest(${TA.Sql.tokens("text")}) AS term FROM documents))
        SELECT term, count(*) AS df,
          array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
        FROM pairs GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Weighted PageRank over the event-transition graph: edges are
    // (event_type → next event_type) counts per user session order — the
    // corpus-scale stage is ONE lag window over (user_id, ts) plus a keyed
    // count; the rank iteration then runs on the tiny node graph (joins
    // auto-broadcast). Fixed-point integer arithmetic throughout — per-edge
    // contribution r·w DIV out-weight, damping as (85·Σ) DIV 100 — so three
    // iterations are bit-identical cross-engine with no float summation
    // order anywhere.
    GraftQuery(
      "graph01_pagerank",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val seq = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
        val e = seq.filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
          .agg(count(lit(1)).as("w"))
        val outw = e.groupBy(col("src")).agg(sum(col("w")).as("tw"))
        val ew = e.join(outw, "src")
        var r = seq.select(col("event_type").as("node")).distinct()
          .withColumn("r", lit(1000000L))
        for (_ <- 1 to 3) {
          r = ew.join(r, col("node") === col("src"))
            .select(col("dst"), expr("(r * w) DIV tw").as("contrib"))
            .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * s) DIV 100")).as("r"))
        }
        r.select(col("node"), col("r").as("rank_micro"))
      },
      Some("""WITH seq AS (SELECT user_id, event_type, lead(event_type) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events),
          e AS (SELECT event_type AS src, nxt AS dst, count(*) AS w FROM seq
            WHERE nxt IS NOT NULL GROUP BY 1, 2),
          outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM e GROUP BY 1),
          r0 AS (SELECT event_type AS node, CAST(1000000 AS BIGINT) AS r
            FROM (SELECT DISTINCT event_type FROM events)),
          r1 AS (SELECT e.dst AS node,
              150000 + (85 * CAST(sum((r0.r * e.w) // outw.tw) AS BIGINT)) // 100 AS r
            FROM e JOIN outw USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
          r2 AS (SELECT e.dst AS node,
              150000 + (85 * CAST(sum((r1.r * e.w) // outw.tw) AS BIGINT)) // 100 AS r
            FROM e JOIN outw USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
          r3 AS (SELECT e.dst AS node,
              150000 + (85 * CAST(sum((r2.r * e.w) // outw.tw) AS BIGINT)) // 100 AS r
            FROM e JOIN outw USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1)
        SELECT node, CAST(r AS BIGINT) AS rank_micro FROM r3"""),
    ),

    // ------------------------------------------------------------------
    // Percentile-based corpus curation: drop the bottom decile of documents
    // per language, ranked by the composite quality score (ties broken by
    // token count then doc id, so the ordering is total and the percentile
    // cut deterministic). The canonical quality pre-filter before training:
    // one shuffle on lang, the rank is a single window pass, and the
    // percent_rank division is a single ordered float op — engine-exact.
    GraftQuery(
      "text11_quality_filter",
      (s, d) => {
        val qm = round(TA.qualityScore(col("text")) * 1000000.0).cast("long")
        val scored = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            qm.as("qm"), TA.tokenCount(col("text")).as("ntok"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("qm").asc, col("ntok").asc, col("doc_id").asc)
        scored.withColumn("pr", percent_rank().over(w))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            count(when(col("pr") >= 0.1, 1)).as("kept"),
            sum(when(col("pr") >= 0.1, col("doc_id"))).as("id_sum"))
      },
      Some(s"""WITH s AS (SELECT lang, doc_id,
            CAST(round((${TA.Sql.qualityScore("text")}) * 1000000.0e0) AS BIGINT) AS qm,
            ${TA.Sql.tokenCount("text")} AS ntok FROM documents),
          r AS (SELECT lang, doc_id,
            percent_rank() OVER (PARTITION BY lang ORDER BY qm, ntok, doc_id) AS pr
          FROM s)
        SELECT lang, count(*) AS n_docs,
          count(*) FILTER (WHERE pr >= 0.1e0) AS kept,
          CAST(sum(doc_id) FILTER (WHERE pr >= 0.1e0) AS BIGINT) AS id_sum
        FROM r GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // The composed curation pipeline — exact-dedup survivors → per-language
    // quality decile filter → per-domain cap — in ONE declarative plan, the
    // way a real corpus build chains the operators. Catalyst pipelines the
    // three stages (fingerprint window → quality window → priority window)
    // with one shuffle each on their natural keys; nothing materializes
    // between stages. Per-language output: documents surviving all three
    // gates, their characters, and the id checksum.
    GraftQuery(
      "pipe01_curation",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // stage 1: exact-dedup survivors (lowest doc_id per fingerprint)
        val fpW = Window.partitionBy(TA.fingerprint(col("text")))
          .orderBy(col("doc_id"))
        val survivors = docs.withColumn("rn", row_number().over(fpW))
          .filter(col("rn") === 1).drop("rn")
        // stage 2: drop the bottom quality decile per language
        val qm = round(TA.qualityScore(col("text")) * 1000000.0).cast("long")
        val qW = Window.partitionBy(col("lang"))
          .orderBy(qm.asc, TA.tokenCount(col("text")).asc, col("doc_id").asc)
        val quality = survivors.withColumn("pr", percent_rank().over(qW))
          .filter(col("pr") >= 0.1).drop("pr")
        // stage 3: at most 20 docs per source by md5 priority
        val pri = TA.hash60(concat(lit("cap:"), col("doc_id").cast("string")))
        val cW = Window.partitionBy(col("source")).orderBy(pri.asc, col("doc_id").asc)
        val capped = quality.withColumn("rn", row_number().over(cW))
          .filter(col("rn") <= 20)
        capped.groupBy(col("lang"))
          .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("chars"),
            sum(col("doc_id")).as("id_sum"))
      },
      Some(s"""WITH survivors AS (
          SELECT * FROM (SELECT *, row_number() OVER (
              PARTITION BY ${TA.Sql.fingerprint("text")} ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1),
        quality AS (
          SELECT * FROM (SELECT *, percent_rank() OVER (PARTITION BY lang
              ORDER BY CAST(round((${TA.Sql.qualityScore("text")}) * 1000000.0e0) AS BIGINT),
                ${TA.Sql.tokenCount("text")}, doc_id) AS pr
            FROM survivors) WHERE pr >= 0.1e0),
        capped AS (
          SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY ${TA.Sql.hash60("'cap:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rn2
            FROM quality) WHERE rn2 <= 20)
        SELECT lang, count(*) AS kept, CAST(sum(n_chars) AS BIGINT) AS chars,
          CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM capped GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Small-file compaction planning: next-fit bin packing of per-source
    // files (documents as stand-ins, n_chars as sizes) into ~4000-byte
    // output bins via a running-sum window. The plan itself is what a
    // 100 TB table-maintenance job computes before rewriting millions of
    // small parquet files; one shuffle on source, cumulative sum is a
    // single window pass per partition.
    GraftQuery(
      "layout07_compaction_bins",
      (s, d) => {
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("prev", coalesce(sum(col("n_chars")).over(w), lit(0L)))
          .groupBy(col("source"), expr("prev DIV 4000").as("bin"))
          .agg(count(lit(1)).as("files"), sum(col("n_chars")).as("bytes"))
      },
      Some("""WITH c AS (SELECT source, doc_id, n_chars,
            sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
          FROM documents)
        SELECT source, CAST(COALESCE(prev, 0) // 4000 AS BIGINT) AS bin,
          count(*) AS files, CAST(sum(n_chars) AS BIGINT) AS bytes
        FROM c GROUP BY 1, 2"""),
    ),

    // ------------------------------------------------------------------
    // Bigram-LM perplexity scoring (the CCNet-style quality signal: docs
    // whose text the corpus LM finds surprising score high). One pass
    // explodes bigrams; c(w1,w2) is a map-side-combinable groupBy, and the
    // context count c(w1) = Σ_w2 c(w1,w2) is derived FROM the bigram table
    // (a per-w1 window over the distinct-bigram frame), so the instance
    // stream is aggregated exactly once. Scoring joins the instance stream
    // against the pre-joined (w1,w2)→cost table — one instance-scale
    // shuffle on the n-gram key (never broadcast: the cost table is
    // corpus-vocabulary-sized), then the per-doc aggregate. Per-bigram
    // cost −ln P(w2|w1) = ln(c1/c12) quantizes to integer micro-nats per
    // row (the text06 contract); per-doc sums and the integer-division
    // average/band are then exact cross-engine.
    GraftQuery(
      "text13_ngram_perplexity",
      (s, d) => {
        // tokenize into a MATERIALIZED column first: referencing the raw
        // split() inside the transform lambda re-evaluates the regex split
        // for EVERY element_at — O(tokens²) splits per row, measured 4.6 s
        // for a 266k-bigram corpus; bound to a column it runs once per row
        val toks = col("toks")
        val bigrams = when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("w1"),
              element_at(toks, i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
        // ONE pass over the instance stream: reduce straight to
        // per-(doc, bigram) counts (map-side combined), persist THAT —
        // serialized, it is the smallest frame every later stage can be
        // derived from (c12 = Σk by bigram; per-doc sums weight by k) —
        // instead of the raw exploded stream (cache-heavy) or no cache
        // (re-tokenizes the corpus per consumer; measured 9.5 s vs 0.8 s)
        val bgc = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), TA.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), explode(bigrams).as("b"))
          .select(col("doc_id"), col("lang"),
            col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("k"))
          .transform(graft.core.Caches.persistLevel(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
        val c12 = bgc.groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("n12"))
        val cost = c12
          .withColumn("n1", sum(col("n12")).over(Window.partitionBy(col("w1"))))
          .select(col("w1"), col("w2"),
            round(log(col("n1").cast("double") / col("n12")) * 1000000.0)
              .cast("long").as("cost_micro"))
        bgc.join(cost, Seq("w1", "w2"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("k")).as("n_bg"),
            sum(col("k") * col("cost_micro")).as("nll_micro"))
          .withColumn("avg_micro", expr("nll_micro DIV n_bg"))
          .withColumn("band", expr("(nll_micro DIV n_bg) DIV 500000"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, ${TA.Sql.tokens("text")} AS toks FROM documents),
          bg AS (SELECT doc_id, lang, toks[i] AS w1, toks[i+1] AS w2
            FROM t, UNNEST(generate_series(1, len(toks)-1)) AS u(i)
            WHERE len(toks) >= 2),
          c12 AS (SELECT w1, w2, count(*) AS n12 FROM bg GROUP BY 1, 2),
          c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
          cost AS (SELECT doc_id, lang,
              CAST(round(ln(CAST(n1 AS DOUBLE)/n12)*1000000.0) AS BIGINT) AS cost_micro
            FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
          per AS (SELECT doc_id, lang, count(*) AS n_bg,
              CAST(sum(cost_micro) AS BIGINT) AS nll_micro FROM cost GROUP BY 1, 2)
        SELECT doc_id, lang, n_bg, nll_micro, nll_micro // n_bg AS avg_micro,
          (nll_micro // n_bg) // 500000 AS band
        FROM per"""),
    ),

    // ------------------------------------------------------------------
    // Triangle counting over the part co-purchase graph (graph01's sibling:
    // clustering-coefficient-style community signal). The graph build is
    // scale-safe by construction — pairs are generated WITHIN an order
    // (schema-bounded ≤7 lines, so pair generation is linear in lineitem,
    // never all-pairs) and thresholded at support ≥ 2 (the frequent-itemset
    // cut that keeps the edge set sparse). Counting uses degree-ordered
    // edge orientation — every wedge is enumerated at its lowest-degree
    // vertex, the standard O(m^1.5) bound that survives skewed hubs — then
    // one semi-join back to the edge set closes triangles. Integer-only.
    GraftQuery(
      "graph02_triangles",
      (s, d) => {
        val e = copurchaseEdges(s, d).transform(graft.core.Caches.persist)
        val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("dg"))
        val ord = e
          .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
          .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("u"))
              .otherwise(col("v")).as("s"),
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("v"))
              .otherwise(col("u")).as("t"))
        // wedges via per-vertex adjacency SETS + in-row pair expansion
        // (the assoc01 shape): one shuffle on s instead of a self-join's
        // two, and the sorted list gives u<v directly. Out-degrees are
        // bounded by the degree orientation, so the in-row fan-out is the
        // wedge count itself — never more.
        val adj = ord.groupBy(col("s")).agg(sort_array(collect_list(col("t"))).as("ts"))
        val ts = col("ts")
        val wedgePairs = flatten(transform(ts, (t1, i) =>
          transform(slice(ts, i + 2, greatest(size(ts) - i - 1, lit(0))),
            t2 => struct(t1.as("u"), t2.as("v")))))
        val wedge = adj.select(explode(wedgePairs).as("w"))
          .select(col("w.u").as("u"), col("w.v").as("v"))
        val tri = wedge.join(e, Seq("u", "v"), "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        tri.crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      },
      Some(s"""WITH $sqlCopurchaseEdges,
          deg AS (SELECT u AS node, count(*) AS dg
            FROM (SELECT u FROM e UNION ALL SELECT v FROM e) t(u) GROUP BY 1),
          o AS (SELECT
              CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.u ELSE e.v END AS s,
              CASE WHEN (du.dg, e.u) < (dv.dg, e.v) THEN e.v ELSE e.u END AS t
            FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
          wedge AS (SELECT least(a.t, b.t) AS u, greatest(a.t, b.t) AS v
            FROM o a JOIN o b ON a.s = b.s AND a.t < b.t)
        SELECT (SELECT count(*) FROM wedge w JOIN e USING (u, v)) AS n_triangles,
          (SELECT count(*) FROM e) AS n_edges,
          (SELECT count(*) FROM deg) AS n_nodes"""),
    ),

    // ------------------------------------------------------------------
    // Label-propagation communities (Raghavan et al. 2007) over the same
    // co-purchase graph: every node starts in its own community, then two
    // SYNCHRONIZED rounds replace each node's label with its neighbors'
    // majority label (ties -> smallest label, the determinism the async
    // original lacks). Each round is one equi-join (messages) + one
    // partial-agg'd count + one per-node window — the same per-round shape
    // as dedup07's CC pass, bounded rounds instead of convergence. At
    // 100 TB the label table shuffles by node id and the neighbor counts
    // combine map-side; nothing is ever collected.
    GraftQuery(
      "graph03_label_prop",
      (s, d) => {
        val e = copurchaseEdges(s, d).transform(graft.core.Caches.persist)
        val bi = e.select(col("u").as("n"), col("v").as("m"))
          .unionAll(e.select(col("v").as("n"), col("u").as("m")))
          .transform(graft.core.Caches.persist) // both rounds scan it
        var labels = bi.select(col("n").as("node")).distinct()
          .withColumn("lbl", col("node"))
        for (_ <- 1 to 2) {
          val w = Window.partitionBy(col("n"))
            .orderBy(col("c").desc, col("lbl").asc)
          labels = bi.join(labels, col("m") === col("node"))
            .groupBy(col("n"), col("lbl")).agg(count(lit(1)).as("c"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("n").as("node"), col("lbl"))
        }
        labels.groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_members"), min(col("node")).as("first_node"))
      },
      Some(s"""WITH $sqlCopurchaseEdges,
          bi AS (SELECT u AS n, v AS m FROM e UNION ALL SELECT v, u FROM e),
          l0 AS (SELECT DISTINCT n AS node, n AS lbl FROM bi),
          r1 AS (SELECT node, lbl FROM (
              SELECT bi.n AS node, l.lbl, count(*) AS c,
                row_number() OVER (PARTITION BY bi.n
                  ORDER BY count(*) DESC, l.lbl) AS rn
              FROM bi JOIN l0 l ON bi.m = l.node GROUP BY bi.n, l.lbl)
            WHERE rn = 1),
          r2 AS (SELECT node, lbl FROM (
              SELECT bi.n AS node, l.lbl, count(*) AS c,
                row_number() OVER (PARTITION BY bi.n
                  ORDER BY count(*) DESC, l.lbl) AS rn
              FROM bi JOIN r1 l ON bi.m = l.node GROUP BY bi.n, l.lbl)
            WHERE rn = 1)
        SELECT lbl AS community, count(*) AS n_members, min(node) AS first_node
        FROM r2 GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Market-basket association rules (support / confidence / lift): ONE
    // corpus-scale shuffle total — lineitem⨝part groups straight into
    // per-basket item SETS (collect_set partial-aggregates map-side, so
    // the exchange carries deduped sets, not line items), and every later
    // stage is basket-local: pair fan-out is an in-row array expression
    // over the ≤7-item set (linear in orders, never a self-join), item
    // frequencies and pair counts partial-aggregate into
    // vocabulary-sized tables (25 brands → ≤600 rules at ANY corpus
    // scale) that join back as broadcasts. Every metric is one
    // textually-mirrored double expression over exact BIGINT counts,
    // rounded once.
    GraftQuery(
      "assoc01_basket_rules",
      (s, d) => {
        val baskets = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
          .groupBy(col("ok"))
          .agg(sort_array(collect_set(col("item"))).as("items"))
          .transform(graft.core.Caches.persist) // baskets feed n/i/pr without a re-scan
        val n = baskets.agg(count(lit(1)).as("n_baskets"))
        val i = baskets.select(explode(col("items")).as("item"))
          .groupBy(col("item")).agg(count(lit(1)).as("c_item"))
        val pairs = flatten(transform(col("items"),
          a => transform(filter(col("items"), c => c =!= a),
            c => struct(a.as("ante"), c.as("cons")))))
        val pr = baskets.select(explode(pairs).as("p"))
          .groupBy(col("p.ante").as("ante"), col("p.cons").as("cons"))
          .agg(count(lit(1)).as("c_ab"))
        pr
          .join(broadcast(i.select(col("item").as("ante"), col("c_item").as("c_a"))), "ante")
          .join(broadcast(i.select(col("item").as("cons"), col("c_item").as("c_b"))), "cons")
          .crossJoin(broadcast(n))
          .select(col("ante"), col("cons"), col("c_ab"),
            round(col("c_ab") * 1000000.0 / col("n_baskets")).cast("long").as("supp_ppm"),
            round(col("c_ab") * 1000000.0 / col("c_a")).cast("long").as("conf_ppm"),
            round(col("c_ab").cast("double") * col("n_baskets") / col("c_a") / col("c_b")
              * 1000000.0).cast("long").as("lift_micro"))
      },
      Some("""WITH b AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          n AS (SELECT count(DISTINCT ok) AS n_baskets FROM b),
          i AS (SELECT item, count(*) AS c_item FROM b GROUP BY 1),
          pr AS (SELECT a.item AS ante, c.item AS cons, count(*) AS c_ab
            FROM b a JOIN b c ON a.ok = c.ok AND a.item <> c.item GROUP BY 1, 2)
        SELECT pr.ante, pr.cons, pr.c_ab,
          CAST(round(pr.c_ab * 1000000.0 / n.n_baskets) AS BIGINT) AS supp_ppm,
          CAST(round(pr.c_ab * 1000000.0 / ia.c_item) AS BIGINT) AS conf_ppm,
          CAST(round(CAST(pr.c_ab AS DOUBLE) * n.n_baskets / ia.c_item / ib.c_item
            * 1000000.0) AS BIGINT) AS lift_micro
        FROM pr JOIN i ia ON ia.item = pr.ante JOIN i ib ON ib.item = pr.cons, n"""),
    ),

    // ------------------------------------------------------------------
    // Gap-filled daily resample (time-series regularization): each user's
    // activity is re-emitted on a dense per-user calendar — days without
    // events appear as explicit zero rows. The calendar explodes from the
    // per-user (min_day, max_day) span (bounded by the corpus time window,
    // never by row count) and the left join back to the daily counts is
    // (user_id, day)-keyed — at 100 TB both sides shuffle once on the same
    // key. Days render as strings so the cross-engine compare is
    // type-stable.
    GraftQuery(
      "ev16_resample",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val per = days.groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_events"))
        val cal = days.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
        cal.join(per, Seq("user_id", "day"), "left")
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            col("n_events").isNull.cast("int").as("gap"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events),
          per AS (SELECT user_id, day, count(*) AS n_events FROM e GROUP BY 1, 2),
          span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
          cal AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
            FROM span)
        SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
          COALESCE(p.n_events, 0) AS n_events,
          CAST(CASE WHEN p.n_events IS NULL THEN 1 ELSE 0 END AS INTEGER) AS gap
        FROM cal c LEFT JOIN per p ON p.user_id = c.user_id AND p.day = c.day"""),
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
        val bpe = bpeTrain(s, d)._2
          .select(col("token").as("w"),
            size(split(trim(col("seq")), "  ")).as("bpe_syms"))
        val toks = Tables.documents(s, d)
          .select(col("lang"), explode(TA.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
        val wcDf = graft.core.Caches.persist(
          toks.groupBy(col("w")).agg(count(lit(1)).as("n")))
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
  )
}
