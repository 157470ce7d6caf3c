package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Clustering, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus QUALITY surface, split out of CorpusQueries in round 10 (file
  * size hygiene; every query body byte-identical): distribution QC and
  * drift audits (qc01-qc17). Mixture planning, clustering, and SemDeDup
  * moved to [[MixtureQueries]] in the round-13 split (bodies
  * byte-identical). All beyond the reference's scope, sized for the
  * 100 TB target, each exactly reproduced by a DuckDB oracle.
  */
object QcQueries {


  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Z-score outlier flags (the numeric quality-control pass of a data
    // pipeline): two passes over the fact table — (1) per-group exact
    // integer sums n/Σd/Σd² (one map-side-combinable groupBy; dollar-scaled
    // longs keep Σd² < 2⁶³ through ~1000× this SF), (2) broadcast the
    // 3-row stats back and flag |d − μ| > 2σ. μ and σ² are derived from the
    // exact integers by FIXED-ORDER double ops mirrored textually in the
    // oracle, so the flag — and the boundary cases — are bit-identical
    // cross-engine. The standard scale shape: no sort, no window, the fact
    // table never shuffles (stats broadcast).
    GraftQuery(
      "qc01_zscore_outliers",
      (s, d) => {
        val rows = Tables.lineitem(s, d).select(
          col("l_returnflag").as("grp"),
          round(col("l_extendedprice")).cast("long").as("d"))
        val stats = rows.groupBy(col("grp")).agg(
          count(lit(1)).as("n"), sum(col("d")).as("s"),
          sum(col("d") * col("d")).as("q"))
        rows.join(broadcast(stats), Seq("grp"))
          .withColumn("mean", col("s").cast("double") / col("n"))
          .withColumn("variance",
            col("q").cast("double") / col("n") - col("mean") * col("mean"))
          .withColumn("is_out",
            (col("d") - col("mean")) * (col("d") - col("mean")) >
              lit(4.0) * col("variance"))
          .groupBy(col("grp"))
          .agg(count(lit(1)).as("n"),
            count(when(col("is_out"), lit(1))).as("n_outliers"),
            min(col("mean")).as("mean_price"))
      },
      Some("""WITH r AS (SELECT l_returnflag AS grp,
            CAST(round(l_extendedprice) AS BIGINT) AS d FROM lineitem),
          st AS (SELECT grp, count(*) AS n, CAST(sum(d) AS BIGINT) AS s,
              CAST(sum(d*d) AS BIGINT) AS q FROM r GROUP BY 1),
          j AS (SELECT r.grp, d, CAST(s AS DOUBLE)/n AS mean,
              CAST(q AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n) AS variance
            FROM r JOIN st USING (grp))
        SELECT grp, count(*) AS n,
          count(CASE WHEN (d - mean)*(d - mean) > 4.0*variance THEN 1 END) AS n_outliers,
          min(mean) AS mean_price
        FROM j GROUP BY grp"""),
    ),

    // ------------------------------------------------------------------
    // Batch-level drift QC (the feed-monitoring companion to qc01's
    // row-level outliers): per (event_type, day) batch, flag days whose
    // mean deviates from the full-history mean by more than 2 standard errors
    // (z-test, (μ_d − μ)² > 4σ²/n). Same determinism contract as qc01:
    // exact integer sums n/Σc/Σc² in two map-side-combinable groupBys
    // (cents-scaled longs — Σc² < 2⁶³ through ~10000× this SF), the 5-row
    // global stats broadcast back to the day-level frame, and μ/σ² derived
    // by FIXED-ORDER double ops mirrored textually in the oracle. The fact
    // table is scanned once per aggregate and never shuffled row-wise.
    GraftQuery(
      "qc02_batch_drift",
      (s, d) => {
        val rows = Tables.events(s, d).select(
          col("event_type"),
          to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        val daily = rows.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sd"))
        val glob = rows.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nn"), sum(col("cents")).as("ss"),
            sum(col("cents") * col("cents")).as("qq"))
        daily.join(broadcast(glob), Seq("event_type"))
          .withColumn("mean_g", col("ss").cast("double") / col("nn"))
          .withColumn("var_g",
            col("qq").cast("double") / col("nn") - col("mean_g") * col("mean_g"))
          .withColumn("mean_d", col("sd").cast("double") / col("n"))
          .withColumn("is_drift",
            (col("mean_d") - col("mean_g")) * (col("mean_d") - col("mean_g")) >
              lit(4.0) * col("var_g") / col("n"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            count(when(col("is_drift"), lit(1))).as("n_drift_days"))
      },
      Some("""WITH r AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(round(value * 100) AS BIGINT) AS cents FROM events),
          daily AS (SELECT event_type, day, count(*) AS n,
              CAST(sum(cents) AS BIGINT) AS sd FROM r GROUP BY 1, 2),
          gs AS (SELECT event_type, count(*) AS nn, CAST(sum(cents) AS BIGINT) AS ss,
              CAST(sum(cents * cents) AS BIGINT) AS qq FROM r GROUP BY 1),
          j AS (SELECT d.event_type, n,
              CAST(sd AS DOUBLE) / n AS mean_d, CAST(ss AS DOUBLE) / nn AS mean_g,
              CAST(qq AS DOUBLE) / nn - (CAST(ss AS DOUBLE) / nn) * (CAST(ss AS DOUBLE) / nn) AS var_g
            FROM daily d JOIN gs g USING (event_type))
        SELECT event_type, count(*) AS n_days,
          count(CASE WHEN (mean_d - mean_g) * (mean_d - mean_g) > 4.0 * var_g / n
            THEN 1 END) AS n_drift_days
        FROM j GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Embedding-space drift QC (qc02's z-test lifted to the vector
    // modality): the corpus splits into a reference half and a batch half
    // (vec_id parity — the deterministic stand-in for "last week vs this
    // week's embedding run"); per label the two centroids are compared by
    // squared L2 shift. Centroids use the kmeans integer-quantization
    // contract: per-dimension sums of round(v_d·Q) are EXACT BIGINTs (one
    // map-side-combinable groupBy over label×split×dim — the corpus never
    // shuffles whole vectors), divided once; the shift is three sequential
    // list_dot_products on dim-ordered arrays, so every float op has one
    // fixed order in both engines. At 100 TB the explode is a projection
    // (64 ints per vector) and everything after the first agg is
    // label-sized.
    GraftQuery(
      "qc10_embedding_drift",
      (s, d) => {
        val Q = Clustering.Quant
        val e = Tables.embeddings(s, d).select(col("label"),
          (col("vec_id") % 2 === 1).as("is_batch"),
          Similarity.toDouble(col("embedding")).as("v"))
        val u = e.select(col("label"), col("is_batch"),
            posexplode(col("v")).as(Seq("d", "x")))
          .groupBy(col("label"), col("is_batch"), col("d"))
          .agg(sum(round(col("x") * Q).cast("long")).as("sq"),
            count(lit(1)).as("n"))
        val cent = u.groupBy(col("label"), col("is_batch"))
          .agg(transform(
              array_sort(collect_list(struct(col("d"), col("sq"), col("n")))),
              t => (t.getField("sq") / Q) / t.getField("n")).as("c"),
            min(col("n")).as("n"))
        val r = cent.filter(!col("is_batch"))
          .select(col("label"), col("c").as("cr"), col("n").as("n_ref"))
        val b = cent.filter(col("is_batch"))
          .select(col("label"), col("c").as("cb"), col("n").as("n_batch"))
        val shift2 = Similarity.dot(col("cr"), col("cr")) +
          Similarity.dot(col("cb"), col("cb")) -
          lit(2.0) * Similarity.dot(col("cr"), col("cb"))
        r.join(b, Seq("label"))
          .select(col("label"), col("n_ref"), col("n_batch"),
            shift2.as("shift2"),
            (shift2 > 0.001).cast("int").as("drifted"))
      },
      Some {
        val Q = Clustering.Quant
        s"""WITH e AS (SELECT label, vec_id % 2 = 1 AS is_batch,
              embedding::DOUBLE[] AS v FROM embeddings),
          u AS (SELECT label, is_batch, d,
              CAST(sum(CAST(round(v[d+1]*$Q) AS BIGINT)) AS BIGINT) AS sq,
              count(*) AS n
            FROM e, UNNEST(generate_series(0, 63)) AS g(d) GROUP BY 1, 2, 3),
          cent AS (SELECT label, is_batch, list((sq / $Q) / n ORDER BY d) AS c,
              min(n) AS n FROM u GROUP BY 1, 2),
          r AS (SELECT label, c AS cr, n AS n_ref FROM cent WHERE NOT is_batch),
          b AS (SELECT label, c AS cb, n AS n_batch FROM cent WHERE is_batch)
        SELECT label, n_ref, n_batch,
          list_dot_product(cr, cr) + list_dot_product(cb, cb)
            - 2*list_dot_product(cr, cb) AS shift2,
          CAST(list_dot_product(cr, cr) + list_dot_product(cb, cb)
            - 2*list_dot_product(cr, cb) > 0.001 AS INT) AS drifted
        FROM r JOIN b USING (label)"""
      },
    ),

    // ------------------------------------------------------------------
    // Expectation-suite QC (the Deequ/Great-Expectations shape): five
    // declared checks — completeness, key uniqueness, value-domain,
    // numeric bounds, regex pattern — evaluated in ONE aggregate pass over
    // the fact table (the distinct-count check rides Spark's expand in the
    // same job), then pivoted to a check-report of rows. At 100 TB the
    // whole suite is one scan; each metric is an exact integer count and
    // each ppm is a single rounded division of two BIGINTs.
    GraftQuery(
      "qc04_expectations",
      (s, d) => {
        val a = Tables.orders(s, d).agg(
          count(lit(1)).as("n"),
          count(col("o_orderpriority")).as("c_nn"),
          countDistinct(col("o_orderkey")).as("u_key"),
          count(when(col("o_orderstatus").isin("O", "F", "P"), lit(1))).as("c_status"),
          count(when(col("o_totalprice").between(1000, 200000), lit(1))).as("c_price"),
          count(when(col("o_orderpriority").rlike("^[1-3]-"), lit(1))).as("c_prio"))
        def check(name: String, c: org.apache.spark.sql.Column) =
          struct(lit(name).as("chk"),
            round(c * 1000000.0 / col("n")).cast("long").as("observed_ppm"),
            (col("n") - c).as("violations"))
        a.select(explode(array(
            check("completeness_priority", col("c_nn")),
            check("uniqueness_orderkey", col("u_key")),
            check("domain_status", col("c_status")),
            check("bounds_totalprice", col("c_price")),
            check("pattern_priority", col("c_prio")))).as("c"))
          .select(col("c.chk").as("chk"), col("c.observed_ppm").as("observed_ppm"),
            col("c.violations").as("violations"))
          .withColumn("passed", (col("violations") === 0).cast("int"))
      },
      Some("""WITH a AS (SELECT count(*) AS n,
            count(o_orderpriority) AS c_nn,
            count(DISTINCT o_orderkey) AS u_key,
            count(*) FILTER (o_orderstatus IN ('O','F','P')) AS c_status,
            count(*) FILTER (o_totalprice BETWEEN 1000 AND 200000) AS c_price,
            count(*) FILTER (regexp_matches(o_orderpriority, '^[1-3]-')) AS c_prio
          FROM orders),
        r AS (
          SELECT 'completeness_priority' AS chk,
            CAST(round(c_nn*1000000.0/n) AS BIGINT) AS observed_ppm, n - c_nn AS violations FROM a
          UNION ALL SELECT 'uniqueness_orderkey',
            CAST(round(u_key*1000000.0/n) AS BIGINT), n - u_key FROM a
          UNION ALL SELECT 'domain_status',
            CAST(round(c_status*1000000.0/n) AS BIGINT), n - c_status FROM a
          UNION ALL SELECT 'bounds_totalprice',
            CAST(round(c_price*1000000.0/n) AS BIGINT), n - c_price FROM a
          UNION ALL SELECT 'pattern_priority',
            CAST(round(c_prio*1000000.0/n) AS BIGINT), n - c_prio FROM a)
        SELECT chk, observed_ppm, violations,
          CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
        FROM r"""),
    ),

    // ------------------------------------------------------------------
    // k-anonymity audit (privacy QC before a data release): group sizes
    // over the quasi-identifier tuple (nation, segment, rounded balance
    // band); any combination shared by fewer than k=5 individuals is
    // re-identifiable. Two map-side-combinable aggregations — QI-tuple
    // sizes, then a segment-level rollup of the risk — with the fact table
    // scanned ONCE; the audit output is segment-sized at any corpus scale.
    GraftQuery(
      "qc05_kanonymity",
      (s, d) => {
        val g = Tables.customer(s, d)
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            expr("CAST(round(c_acctbal) AS BIGINT) DIV 1000").as("bal_band"))
          .agg(count(lit(1)).as("sz"))
        g.groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_combos"),
            count(when(col("sz") < 5, lit(1))).as("risky_combos"),
            sum(when(col("sz") < 5, col("sz")).otherwise(lit(0L))).as("risky_rows"),
            min(col("sz")).as("min_group"),
            max(col("sz")).as("max_group"))
      },
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
            CAST(round(c_acctbal) AS BIGINT) // 1000 AS bal_band, count(*) AS sz
          FROM customer GROUP BY 1, 2, 3)
        SELECT c_mktsegment AS segment, count(*) AS n_combos,
          count(*) FILTER (sz < 5) AS risky_combos,
          CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS risky_rows,
          min(sz) AS min_group, max(sz) AS max_group
        FROM g GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Population-stability-index drift audit (the standard scorecard drift
    // metric, complementing qc02's mean-shift test): event values bin to 8
    // fixed-width cells, the month splits in half by calendar day, and
    // PSI = Σ (p_a − p_b)·ln(p_a/p_b) with add-one smoothing so empty
    // cells stay finite. The bin grid is enumerated (type × 8) so absent
    // cells contribute their smoothed term exactly; each term micro-rounds
    // to an integer before the order-free sum. Two map-side-combinable
    // aggregations + a broadcast of the (type, split)-sized totals — the
    // fact table is scanned once, shuffled never.
    GraftQuery(
      "qc06_psi_drift",
      (s, d) => {
        val rows = Tables.events(s, d).select(
          col("event_type"),
          (dayofmonth(col("ts")) <= 15).as("in_a"),
          greatest(lit(0), least(lit(7), floor(col("value") / 25).cast("int")))
            .as("bin"))
        val binc = rows.groupBy(col("event_type"), col("bin"))
          .agg(count(when(col("in_a"), lit(1))).as("ca"),
            count(when(!col("in_a"), lit(1))).as("cb"))
        val grid = rows.select(col("event_type")).distinct()
          .select(col("event_type"), explode(sequence(lit(0), lit(7))).as("bin"))
        val tot = rows.groupBy(col("event_type"))
          .agg(count(when(col("in_a"), lit(1))).as("ta"),
            count(when(!col("in_a"), lit(1))).as("tb"))
        val pa = (col("ca") + 1).cast("double") / (col("ta") + 8).cast("double")
        val pb = (col("cb") + 1).cast("double") / (col("tb") + 8).cast("double")
        grid.join(binc, Seq("event_type", "bin"), "left")
          .na.fill(0L, Seq("ca", "cb"))
          .join(broadcast(tot), Seq("event_type"))
          .withColumn("term_micro",
            round((pa - pb) * log(pa / pb) * 1000000.0).cast("long"))
          .groupBy(col("event_type"))
          .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
            sum(col("term_micro")).as("psi_micro"))
      },
      Some("""WITH r AS (SELECT event_type,
            day(ts) <= 15 AS in_a,
            greatest(0, least(7, CAST(floor(value / 25) AS INT))) AS bin
          FROM events),
          binc AS (SELECT event_type, bin,
              count(CASE WHEN in_a THEN 1 END) AS ca,
              count(CASE WHEN NOT in_a THEN 1 END) AS cb
            FROM r GROUP BY 1, 2),
          grid AS (SELECT event_type, g.bin FROM (SELECT DISTINCT event_type FROM r),
            (SELECT unnest(generate_series(0, 7)) AS bin) g),
          tot AS (SELECT event_type,
              count(CASE WHEN in_a THEN 1 END) AS ta,
              count(CASE WHEN NOT in_a THEN 1 END) AS tb
            FROM r GROUP BY 1),
          j AS (SELECT g.event_type,
              coalesce(b.ca, 0) + 1 AS sa, coalesce(b.cb, 0) + 1 AS sb, ta, tb
            FROM grid g LEFT JOIN binc b USING (event_type, bin)
            JOIN tot USING (event_type)),
          terms AS (SELECT event_type, ta, tb,
              CAST(round((CAST(sa AS DOUBLE)/(ta+8) - CAST(sb AS DOUBLE)/(tb+8))
                * ln((CAST(sa AS DOUBLE)/(ta+8)) / (CAST(sb AS DOUBLE)/(tb+8)))
                * 1000000.0e0) AS BIGINT) AS term_micro
            FROM j)
        SELECT event_type, max(ta) AS n_a, max(tb) AS n_b,
          CAST(sum(term_micro) AS BIGINT) AS psi_micro
        FROM terms GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Benford first-digit audit (fraud / synthetic-data QC): the leading
    // digit of every order total against the Benford expectation
    // log10(1 + 1/d). Organic monetary data follows the law; fabricated or
    // truncated feeds drift visibly. One scan + a ≤9-cell map-side
    // groupBy; the expectation is a per-digit constant both engines
    // compute from the identical closed form, micro-rounded.
    GraftQuery(
      "qc08_benford",
      (s, d) => {
        val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int")
        val counts = Tables.orders(s, d)
          .filter(col("o_totalprice") >= 1)
          .groupBy(digit.as("digit"))
          .agg(count(lit(1)).as("n"))
        val tot = counts.agg(sum(col("n")).as("total"))
        counts.crossJoin(broadcast(tot))
          .withColumn("obs_ppm", round(col("n") * 1000000.0 / col("total")).cast("long"))
          .withColumn("exp_ppm",
            round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)) * 1000000.0)
              .cast("long"))
          .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
            abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
      },
      Some("""WITH c AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
              AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n
            FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT digit, n,
          CAST(round(n * 1000000.0e0 / total) AS BIGINT) AS obs_ppm,
          CAST(round(ln(1.0e0 + 1.0e0 / digit) / ln(10.0e0) * 1000000.0e0) AS BIGINT)
            AS exp_ppm,
          abs(CAST(round(n * 1000000.0e0 / total) AS BIGINT)
            - CAST(round(ln(1.0e0 + 1.0e0 / digit) / ln(10.0e0) * 1000000.0e0)
              AS BIGINT)) AS dev_ppm
        FROM c, t"""),
    ),

    // ------------------------------------------------------------------
    // Feed-freshness audit (the first page of any pipeline dashboard): per
    // event type, event count, last-seen timestamp, staleness in whole
    // minutes behind the freshest feed, and a >30-min stale flag. One
    // map-side-combinable groupBy + a 1-row broadcast back — integer
    // minute arithmetic on µs timestamps, never a float.
    GraftQuery(
      "qc09_freshness",
      (s, d) => {
        val per = Tables.events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"))
        val glob = per.agg(max(col("last_ts")).as("g_ts"))
        per.crossJoin(broadcast(glob))
          .withColumn("lag_min",
            expr("(unix_micros(g_ts) - unix_micros(last_ts)) div 60000000"))
          .select(col("event_type"), col("n"), col("last_ts"), col("lag_min"),
            (col("lag_min") > 30).cast("int").as("is_stale"))
      },
      Some("""WITH per AS (SELECT event_type, count(*) AS n, max(ts) AS last_ts
            FROM events GROUP BY 1),
          g AS (SELECT max(last_ts) AS g_ts FROM per)
        SELECT event_type, n, last_ts,
          (epoch_us(g_ts) - epoch_us(last_ts)) // 60000000 AS lag_min,
          CAST((epoch_us(g_ts) - epoch_us(last_ts)) // 60000000 > 30 AS INT)
            AS is_stale
        FROM per, g"""),
    ),

    // ------------------------------------------------------------------
    // Metadata-consistency audit over duplicated content: group the
    // corpus by the exact-content fingerprint (dedup01's unit) and flag
    // groups whose copies disagree on lang or source — the label noise
    // dedup-unaware annotation pipelines introduce (the same document
    // crawled twice, tagged differently; training on both teaches the
    // classifier noise). One map-side-combinable groupBy on the
    // fingerprint, a 1-row summary; nothing leaves the executors until
    // the final counts.
    GraftQuery(
      "qc11_fd_audit",
      (s, d) => {
        val g = Tables.documents(s, d)
          .groupBy(TA.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            countDistinct(col("source")).as("n_sources"))
          .filter(col("n_docs") >= 2)
        g.agg(
          count(lit(1)).as("dup_groups"),
          count(when(col("n_langs") > 1, lit(1))).as("lang_violations"),
          count(when(col("n_sources") > 1, lit(1))).as("source_violations"),
          coalesce(sum(when(col("n_langs") > 1, col("n_docs"))), lit(0L))
            .as("docs_in_lang_violation"),
          coalesce(max(col("n_langs")), lit(0L)).as("max_langs"))
      },
      Some(s"""WITH g AS (SELECT ${TA.Sql.fingerprint("text")} AS fp,
              count(*) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              count(DISTINCT source) AS n_sources
            FROM documents GROUP BY 1 HAVING count(*) >= 2)
        SELECT count(*) AS dup_groups,
          count(*) FILTER (n_langs > 1) AS lang_violations,
          count(*) FILTER (n_sources > 1) AS source_violations,
          CAST(coalesce(sum(n_docs) FILTER (n_langs > 1), 0) AS BIGINT)
            AS docs_in_lang_violation,
          coalesce(max(n_langs), 0) AS max_langs
        FROM g"""),
    ),

    // ------------------------------------------------------------------
    // Exact ROC-AUC audit (classifier-calibration QC: is a quality score
    // actually separating the classes it gates on?): AUC computed as the
    // Mann-Whitney pair statistic over a SCORE HISTOGRAM — wins count 2,
    // ties count 1, all integers — so the result is exact at any corpus
    // scale with no per-row ranking: the corpus collapses into one
    // map-side-combinable groupBy on the integer score, the cumulative
    // window runs over the histogram (bounded by the score DOMAIN, never
    // row count — the sketch06 contract), and one rounded ppm division
    // ends it. A global rank-the-corpus window — the textbook AUC plan —
    // would be the exact shape the registry-wide PlanSpec gate bans.
    GraftQuery(
      "qc12_auc_audit",
      (s, d) => {
        val h = Tables.documents(s, d)
          .select(expr("n_chars DIV 16").as("score"),
            (col("lang") === "en").as("pos"))
          .groupBy(col("score"))
          .agg(count(when(col("pos"), lit(1))).as("p"),
            count(when(!col("pos"), lit(1))).as("m"))
        val w = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        h.withColumn("cumm", coalesce(sum(col("m")).over(w), lit(0L)))
          .agg(sum(col("p")).as("n_pos"), sum(col("m")).as("n_neg"),
            sum(col("p") * (col("cumm") * 2) + col("p") * col("m")).as("num2"))
          .select(col("n_pos"), col("n_neg"), col("num2"),
            round(col("num2") * 1000000.0 / (lit(2) * col("n_pos") * col("n_neg")))
              .cast("long").as("auc_ppm"))
      },
      Some("""WITH h AS (SELECT n_chars // 16 AS score,
            count(CASE WHEN lang = 'en' THEN 1 END) AS p,
            count(CASE WHEN lang <> 'en' THEN 1 END) AS m
          FROM documents GROUP BY 1),
        c AS (SELECT p, m, COALESCE(sum(m) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumm
          FROM h),
        a AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
            CAST(sum(m) AS BIGINT) AS n_neg,
            CAST(sum(p * (2 * cumm) + p * m) AS BIGINT) AS num2 FROM c)
        SELECT n_pos, n_neg, num2,
          CAST(round(num2 * 1000000.0 / (2 * n_pos * n_neg)) AS BIGINT) AS auc_ppm
        FROM a"""),
    ),

    // ------------------------------------------------------------------
    // Calibration table (qc12's companion: AUC says the score RANKS, this
    // says whether its bins mean what they claim): fixed-width score bins
    // (value-DOMAIN-bounded, never rank-based), per-bin observed positive
    // rate in exact ppm, and lift vs the corpus base rate — the base rate
    // is a 1-row cross join, every other number one map-side-combinable
    // groupBy. No window at all; the corpus never shuffles twice.
    GraftQuery(
      "qc13_calibration",
      (s, d) => {
        // Round 18 (VERDICT r17 item 8): the corpus base rate is a GLOBAL
        // WINDOW sum over the bin histogram (n_all = Σ n, pos_all = Σ n_pos
        // — the same exact integers) instead of a second aggregate +
        // crossJoin; one scan, no persist needed, bin table is domain-sized.
        Tables.documents(s, d)
          .select(expr("n_chars DIV 64").as("bin"),
            (col("lang") === "en").as("pos"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            count(when(col("pos"), lit(1))).as("n_pos"))
          .withColumn("n_all", expr("sum(n) OVER ()"))
          .withColumn("pos_all", expr("sum(n_pos) OVER ()"))
          .select(col("bin"), col("n"), col("n_pos"),
            round(col("n_pos") * 1000000.0 / col("n")).cast("long").as("pos_ppm"),
            round((col("n_pos").cast("double") * col("n_all")) /
              (col("n") * col("pos_all")) * 1000000.0).cast("long").as("lift_micro"))
      },
      Some("""WITH s AS (SELECT n_chars // 64 AS bin, lang = 'en' AS pos
            FROM documents),
          base AS (SELECT count(*) AS n_all,
              count(CASE WHEN pos THEN 1 END) AS pos_all FROM s),
          b AS (SELECT bin, count(*) AS n,
              count(CASE WHEN pos THEN 1 END) AS n_pos FROM s GROUP BY 1)
        SELECT bin, n, n_pos,
          CAST(round(n_pos * 1000000.0 / n) AS BIGINT) AS pos_ppm,
          CAST(round((CAST(n_pos AS DOUBLE) * n_all) / (n * pos_all)
            * 1000000.0) AS BIGINT) AS lift_micro
        FROM b, base"""),
    ),

    // ------------------------------------------------------------------
    // Exact two-sample Kolmogorov-Smirnov drift test (the distribution-
    // shift audit run between ingestion batches before a corpus refresh
    // ships): per event_type, D = max_x |F_even(x) − F_odd(x)| between
    // the even- and odd-batch value distributions. Everything stays in
    // integers until the final division: values are dollar-scaled to
    // cent longs, the ECDF difference is |cum0·n1 − cum1·n0| over the
    // PRE-AGGREGATED (type, cent) domain, and D = d_num/(n0·n1) is one
    // IEEE divide both engines perform on identical exact integers.
    // Scale shape: the fact table collapses via one map-side-combinable
    // groupBy to at most |types|·|distinct cents| rows — a BOUNDED
    // domain independent of corpus size — so the per-type cumulative
    // window sorts sketch-sized input, never the 100 TB fact table, and
    // the 5-row totals broadcast back.
    GraftQuery(
      "qc14_ks_drift",
      (s, d) => {
        // Round 18 (VERDICT r17 item 8): the per-type totals ride the SAME
        // event_type-partitioned window pass as the cumulative sums
        // (unordered spec over the identical partitioning — no extra
        // shuffle) instead of a second aggregate + broadcast join over a
        // persisted build; one scan, no persist, identical exact integers.
        val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
        val wt = Window.partitionBy(col("event_type"))
        Tables.events(s, d)
          .select(col("event_type"), (col("event_id") % 2).as("b"),
            round(col("value") * 100).cast("long").as("v"))
          .groupBy(col("event_type"), col("v"))
          .agg(count(when(col("b") === 0, lit(1))).as("c0"),
            count(when(col("b") === 1, lit(1))).as("c1"))
          .select(col("event_type"),
            sum(col("c0")).over(w).as("cum0"),
            sum(col("c1")).over(w).as("cum1"),
            sum(col("c0")).over(wt).as("n0"),
            sum(col("c1")).over(wt).as("n1"))
          .groupBy(col("event_type"))
          .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
            max(abs(col("cum0") * col("n1") - col("cum1") * col("n0"))).as("d_num"))
          .select(col("event_type"), col("n0"), col("n1"), col("d_num"),
            (col("d_num").cast("double") / (col("n0") * col("n1"))).as("ks"))
      },
      Some("""WITH e AS (SELECT event_type, event_id % 2 AS b,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
          g AS (SELECT event_type, v,
            count(CASE WHEN b = 0 THEN 1 END) AS c0,
            count(CASE WHEN b = 1 THEN 1 END) AS c1 FROM e GROUP BY 1, 2),
          t AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
            CAST(sum(c1) AS BIGINT) AS n1 FROM g GROUP BY 1),
          c AS (SELECT event_type,
            CAST(sum(c0) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum0,
            CAST(sum(c1) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum1
          FROM g),
          m AS (SELECT c.event_type, max(t.n0) AS n0, max(t.n1) AS n1,
            CAST(max(abs(cum0*t.n1 - cum1*t.n0)) AS BIGINT) AS d_num
          FROM c JOIN t USING (event_type) GROUP BY 1)
        SELECT event_type, n0, n1, d_num,
          CAST(d_num AS DOUBLE) / (n0*n1) AS ks FROM m"""),
    ),

    // ------------------------------------------------------------------
    // Chi-squared independence audit (lang × source): is the language
    // mix homogeneous across ingestion sources, or does one source skew
    // the corpus? Observed counts are exact longs from ONE contingency
    // groupBy; expected counts e = (row·col)/N and each cell's
    // (o−e)²/e term are fixed-order double ops on those exact integers,
    // micro-scaled to longs before the cross-engine sum (the intSum
    // discipline). Scale shape: the fact table collapses to a
    // |langs|×|sources| contingency table; marginals broadcast back —
    // nothing corpus-sized ever shuffles twice.
    GraftQuery(
      "qc15_chi2_independence",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
          .transform(graft.core.Caches.persist) // marginals + terms share one build
        val rows = cells.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val cols = cells.groupBy(col("source")).agg(sum(col("o")).as("c"))
        val tot = cells.agg(sum(col("o")).as("n"))
        val e = (col("r") * col("c")).cast("double") / col("n")
        val term = (col("o") - e) * (col("o") - e) / e
        cells.join(broadcast(rows), "lang").join(broadcast(cols), "source")
          .crossJoin(broadcast(tot))
          .groupBy(col("lang"))
          .agg(sum(col("o")).as("n_lang"),
            count(lit(1)).as("n_cells"),
            sum(round(term * 1000000.0).cast("long")).as("chi2_micro"))
      },
      Some("""WITH cells AS (SELECT lang, source, count(*) AS o
            FROM documents GROUP BY 1, 2),
          r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
          c AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
          n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
          t AS (SELECT lang, o,
            (o - CAST(r.r*c.c AS DOUBLE)/n.n) * (o - CAST(r.r*c.c AS DOUBLE)/n.n)
              / (CAST(r.r*c.c AS DOUBLE)/n.n) AS term
          FROM cells JOIN r USING (lang) JOIN c USING (source), n)
        SELECT lang, CAST(sum(o) AS BIGINT) AS n_lang,
          count(*) AS n_cells,
          CAST(sum(CAST(round(term*1000000.0) AS BIGINT)) AS BIGINT) AS chi2_micro
        FROM t GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // Cohen's kappa inter-rater agreement (the annotation-QA number an
    // RLHF labeling pipeline reports per language before trusting its
    // raters): two deterministic binary raters over each document — A =
    // curate01's word-count band, B = its minimum-stopword rule — and the
    // chance-corrected agreement kappa = (po - pe) / (1 - pe), computed
    // as ONE rounded ppm division of two exact 64-bit integers:
    // kappa_ppm = round(1e6 * (agree*n - (a1*b1 + a0*b0))
    //                        / (n*n    - (a1*b1 + a0*b0))),
    // so no float ever accumulates (n ≤ tens of millions keeps n² well
    // inside 64 bits at any test scale). One corpus projection + one
    // lang-sized map-side-combinable groupBy: pure scan rate at 100 TB.
    GraftQuery(
      "qc16_cohens_kappa",
      (s, d) => {
        val toks = TA.tokens(col("text"))
        val a = size(toks).between(50, 100000).cast("long")
        val b = (TA.stopwordCount(col("text")) >= 2).cast("long")
        val base = Tables.documents(s, d)
          .select(col("lang"), a.as("a"), b.as("b"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("a")).as("a_pos"),
            sum(col("b")).as("b_pos"),
            sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
        base.select(col("lang"), col("n_docs"), col("a_pos"), col("b_pos"),
          col("n_agree"), {
            val n = col("n_docs")
            val chance = col("a_pos") * col("b_pos") +
              (n - col("a_pos")) * (n - col("b_pos"))
            val den = n * n - chance
            when(den === 0L, lit(0L))
              .otherwise(round(lit(1e6) * (col("n_agree") * n - chance) / den)
                .cast("long"))
              .as("kappa_ppm")
          })
      },
      Some {
        val toks = TA.Sql.tokens("text")
        s"""WITH r AS (SELECT lang,
            CAST(len($toks) BETWEEN 50 AND 100000 AS BIGINT) AS a,
            CAST(${TA.Sql.stopwordCount("text")} >= 2 AS BIGINT) AS b
          FROM documents),
        g AS (SELECT lang, count(*) AS n_docs,
            CAST(sum(a) AS BIGINT) AS a_pos, CAST(sum(b) AS BIGINT) AS b_pos,
            CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
          FROM r GROUP BY 1)
        SELECT lang, n_docs, a_pos, b_pos, n_agree,
          CASE WHEN n_docs * n_docs - (a_pos * b_pos
              + (n_docs - a_pos) * (n_docs - b_pos)) = 0 THEN 0
            ELSE CAST(round(1e6 * (n_agree * n_docs - (a_pos * b_pos
                + (n_docs - a_pos) * (n_docs - b_pos)))
              / (n_docs * n_docs - (a_pos * b_pos
                + (n_docs - a_pos) * (n_docs - b_pos)))) AS BIGINT)
          END AS kappa_ppm
        FROM g"""
      },
    ),

    // ------------------------------------------------------------------
    // Data card (round 12): the per-source summary a released corpus
    // ships alongside its shards — document counts, token totals, empty
    // docs, language spread, dominant language (ties to the lex-smallest
    // lang), and the LOWER MEDIAN token count (the order statistic at
    // rank (n+1)/2, exact and engine-independent, unlike interpolating
    // percentile functions). Three per-source partials (one scan each,
    // map-side-combinable or source-partitioned windows) joined on the
    // schema-sized source key: a 100 TB corpus is read once per partial,
    // everything downstream is |sources| rows.
    GraftQuery(
      "qc17_data_card",
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("source"), col("lang"), col("doc_id"), col("n_chars"),
          size(TA.tokens(col("text"))).cast("long").as("tok"))
        val base = docs.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("tok")).as("tok_sum"),
          count(when(col("n_chars") === 0, lit(1))).as("n_empty"),
          countDistinct(col("lang")).as("n_langs"))
        val langW = Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("lang").asc)
        val topLang = docs.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(langW))
          .filter(col("rn") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        val medW = Window.partitionBy(col("source"))
          .orderBy(col("tok").asc, col("doc_id").asc)
        val cntW = Window.partitionBy(col("source"))
        val median = docs
          .select(col("source"), col("tok"),
            row_number().over(medW).as("rn"),
            count(lit(1)).over(cntW).as("cnt"))
          // DIV, not `/`: Spark's Column `/` is ALWAYS double division,
          // so an even n would yield rn === 2.5 and match nothing
          .filter(col("rn") === expr("(cnt + 1) DIV 2"))
          .select(col("source"), col("tok").as("tok_p50"))
        base.join(topLang, Seq("source")).join(median, Seq("source"))
      },
      Some(s"""WITH t AS (SELECT source, lang, doc_id, n_chars,
            CAST(${TA.Sql.tokenCount("text")} AS BIGINT) AS tok
          FROM documents),
        b AS (SELECT source, count(*) AS n_docs,
            CAST(sum(tok) AS BIGINT) AS tok_sum,
            count(CASE WHEN n_chars = 0 THEN 1 END) AS n_empty,
            count(DISTINCT lang) AS n_langs
          FROM t GROUP BY 1),
        l AS (SELECT source, lang AS top_lang FROM (
            SELECT source, lang, count(*) AS n,
              row_number() OVER (PARTITION BY source
                ORDER BY count(*) DESC, lang ASC) AS rn
            FROM t GROUP BY source, lang) WHERE rn = 1),
        m AS (SELECT source, tok AS tok_p50 FROM (
            SELECT source, tok,
              row_number() OVER (PARTITION BY source
                ORDER BY tok ASC, doc_id ASC) AS rn,
              count(*) OVER (PARTITION BY source) AS cnt
            FROM t) WHERE rn = (cnt + 1) // 2)
        SELECT b.source, n_docs, tok_sum, n_empty, n_langs, top_lang, tok_p50
        FROM b JOIN l USING (source) JOIN m USING (source)"""),
    ),
  )
}
