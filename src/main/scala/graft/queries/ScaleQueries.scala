package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Similarity, Sketches, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-engineering operators: approximate sketches (with exact
  * deterministic oracles — see [[graft.ops.Sketches]]), data-layout
  * clustering, stratified sampling, SRP-LSH similarity, and the
  * stream-stream interval join. All beyond the reference surface (the
  * reference has no approximate/layout operators), sized for the 100 TB
  * training-data pipeline target.
  */
object ScaleQueries {

  import Sketches._

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // KMV (bottom-k) distinct-count sketch over l_partkey. The ORDER BY h
    // LIMIT k plans as per-partition top-k + merge (TakeOrderedAndProject):
    // O(k) memory at any scale, no global sort, mergeable across partitions
    // — the way you count distincts on 100 TB without a full shuffle.
    // Estimate and exact count side by side (both deterministic).
    GraftQuery(
      "sketch01_kmv_distinct",
      (s, d) => {
        val k = 256
        val bottom = Tables.lineitem(s, d)
          .select(TA.hash60(col("l_partkey").cast("string")).as("h"))
          .distinct()
          .orderBy(col("h").asc)
          .limit(k)
        val exact = Tables.lineitem(s, d)
          .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
        bottom
          .agg(count(lit(1)).as("k"), max(col("h")).as("kth_min"))
          .withColumn("est_distinct", kmvEstimate(col("k"), col("kth_min")))
          .crossJoin(exact)
      },
      Some {
        val h = sqlHash60("CAST(l_partkey AS VARCHAR)")
        s"""WITH b AS (SELECT DISTINCT $h AS h FROM lineitem ORDER BY h ASC LIMIT 256)
          SELECT count(*) AS k, max(h) AS kth_min,
            ${sqlKmvEstimate("count(*)", "max(h)")} AS est_distinct,
            (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
          FROM b"""
      },
    ),

    // ------------------------------------------------------------------
    // The SAME KMV sketch as a first-class typed Aggregator
    // (graft.ops.KmvAggregator): fixed-capacity mergeable buffer, O(k)
    // state per partition, usable per-group or in SQL (kmv_distinct after
    // registerSql). Must agree exactly with sketch01's declarative plan AND
    // the DuckDB oracle — three implementations, one answer.
    GraftQuery(
      "sketch04_kmv_agg",
      (s, d) => Tables.lineitem(s, d)
        .agg(graft.ops.KmvAggregator.kmvDistinct(
          col("l_partkey").cast("string")).as("est_distinct")),
      Some {
        val h = sqlHash60("CAST(l_partkey AS VARCHAR)")
        s"""WITH b AS (SELECT DISTINCT $h AS h FROM lineitem ORDER BY h ASC LIMIT 256)
          SELECT CASE WHEN count(*) < 256 THEN count(*)
            ELSE ${sqlKmvEstimate("count(*)", "max(h)")} END AS est_distinct
          FROM b"""
      },
    ),

    // ------------------------------------------------------------------
    // Count-min sketch (d=4 rows × w=1024 buckets) over part frequencies in
    // lineitem: the build is ONE map-side-combinable groupBy into ≤ d·w
    // cells regardless of key cardinality; the probe broadcasts the sketch.
    // Report the top-10 estimated-heaviest parts with estimated vs exact
    // counts (CM overestimates; both columns deterministic).
    GraftQuery(
      "sketch02_cm_topk",
      (s, d) => {
        val D = 4
        val W = 1024
        val li = Tables.lineitem(s, d).select(col("l_partkey"))
        // CM is LINEAR in its input counts, so sketch the per-key partial
        // counts instead of raw rows: the fact table is touched by exactly
        // ONE map-side-combined groupBy, and the sketch build + probe then
        // run on |keys| rows. Identical sketch contents, no 4×|rows|
        // explode. (With keys too numerous to aggregate, the same explode
        // runs directly on the fact rows — the sketch update is the same.)
        val keyed = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_cnt"))
          .withColumn("hex", md5(concat(lit("cm:"), col("l_partkey").cast("string"))))
          .select(col("l_partkey"), col("exact_cnt"),
            explode(array((0 until D).map { j =>
              struct(lit(j).as("j"), (hashSlice(col("hex"), j) % W).as("b"))
            }: _*)).as("e"))
          .select(col("l_partkey"), col("exact_cnt"), col("e.j"), col("e.b"))
          .persist()
        val sketch = keyed.groupBy(col("j"), col("b"))
          .agg(sum(col("exact_cnt")).as("c"))
        val est = keyed
          .join(broadcast(sketch), Seq("j", "b"))
          .groupBy(col("l_partkey"), col("exact_cnt")).agg(min(col("c")).as("est_cnt"))
        val w = Window.orderBy(col("est_cnt").desc, col("l_partkey").asc)
        est.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
      },
      Some {
        val buckets = (0 until 4).map { j =>
          s"SELECT l_partkey, exact_cnt, $j AS j, ${sqlCmBucket("l_partkey", j, 1024)} AS b FROM keyed"
        }.mkString(" UNION ALL ")
        s"""WITH keyed AS (SELECT l_partkey, count(*) AS exact_cnt FROM lineitem GROUP BY 1),
          kb AS ($buckets),
          sketch AS (SELECT j, b, CAST(sum(exact_cnt) AS BIGINT) AS c FROM kb GROUP BY 1, 2),
          est AS (SELECT kb.l_partkey, kb.exact_cnt, min(c) AS est_cnt
                  FROM kb JOIN sketch ON kb.j = sketch.j AND kb.b = sketch.b
                  GROUP BY 1, 2)
        SELECT l_partkey, est_cnt, exact_cnt, rnk FROM (
          SELECT l_partkey, est_cnt, exact_cnt,
            row_number() OVER (ORDER BY est_cnt DESC, l_partkey ASC) AS rnk
          FROM est)
        WHERE rnk <= 10"""
      },
    ),

    // ------------------------------------------------------------------
    // Bloom-filter pre-join pruning — the manual form of a runtime join
    // filter: build a 32768-bit bloom (3 salted hashes) over the keys of a
    // filtered dim side (orders placed in 1995), broadcast it as ONE map
    // cell, and pre-filter the fact scan with a shuffle-free bitmap probe
    // BEFORE the real join. At 100 TB this turns a full-fact shuffle into a
    // scan-side drop of ~99% of rows. Output proves the two bloom
    // guarantees: n_false_neg = 0 always; n_false_pos small and exactly
    // reproducible (same hashes → same bitmap in any engine).
    GraftQuery(
      "sketch03_bloom_prejoin",
      (s, d) => {
        val Bits = 32768
        val K = 3
        val dim = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("o_orderkey"))
        // 32-bit words (not 64): DuckDB raises on `1 << 63` overflow, and a
        // 31-max shift keeps every mask positive in both engines.
        val words = dim
          .select(explode(array((0 until K).map(t =>
            bloomHash(col("o_orderkey"), t, Bits).as("h")): _*)).as("h"))
          .select(shiftright(col("h"), 5).as("word"),
            expr("shiftleft(1L, cast(h % 32 as int))").as("mask"))
          .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
        val bloom = words.agg(
          map_from_entries(collect_list(struct(col("word"), col("bits")))).as("bm"))
        val hashed = (0 until K).foldLeft(
            Tables.lineitem(s, d)
              .select(col("l_orderkey"), col("l_linenumber"))
              .crossJoin(broadcast(bloom))
              .withColumn("bhex",
                md5(concat(lit("bf:"), col("l_orderkey").cast("string"))))) { (df, t) =>
          df.withColumn(s"h$t", hashSlice(col("bhex"), t) % Bits)
        }
        val probed = hashed.withColumn("bloom_pass",
          (0 until K).map { t =>
            (coalesce(element_at(col("bm"), shiftright(col(s"h$t"), 5)), lit(0L))
              .bitwiseAND(expr(s"shiftleft(1L, cast(h$t % 32 as int))"))) =!= lit(0L)
          }.reduce(_ && _))
        val withExact = probed.join(
            broadcast(dim.withColumn("hit", lit(1))),
            col("l_orderkey") === col("o_orderkey"), "left")
        withExact.agg(
          count(when(col("bloom_pass"), lit(1))).as("n_bloom_pass"),
          count(when(col("hit").isNotNull, lit(1))).as("n_exact"),
          count(when(col("bloom_pass") && col("hit").isNull, lit(1))).as("n_false_pos"),
          count(when(!col("bloom_pass") && col("hit").isNotNull, lit(1))).as("n_false_neg"))
      },
      Some {
        val Bits = 32768
        def h(key: String, t: Int) = sqlBloomHash(key, t, Bits)
        val dimHashes = (0 until 3).map(t =>
          s"SELECT ${h("o_orderkey", t)} AS h FROM dim").mkString(" UNION ALL ")
        val factHashes = (0 until 3).map(t => s"${h("l_orderkey", t)} AS h$t").mkString(", ")
        // per-row scalar word lookups, NO row grouping: (l_orderkey,
        // l_linenumber) is NOT unique in this data, so an unnest+group-back
        // would collapse duplicate rows and undercount.
        val pass = (0 until 3).map { t =>
          s"(coalesce((SELECT bits FROM words w WHERE w.word = h$t // 32), 0)" +
            s" & (1::BIGINT << CAST(h$t % 32 AS INT))) <> 0"
        }.mkString(" AND ")
        s"""WITH dim AS (SELECT o_orderkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
          hs AS ($dimHashes),
          words AS (SELECT h // 32 AS word, bit_or(1::BIGINT << CAST(h % 32 AS INT)) AS bits
                    FROM hs GROUP BY 1),
          fh AS (SELECT l_orderkey, $factHashes FROM lineitem),
          flagged AS (SELECT
              CASE WHEN $pass THEN 1 ELSE 0 END AS bloom_pass,
              CASE WHEN l_orderkey IN (SELECT o_orderkey FROM dim) THEN 1 ELSE 0 END AS is_match
            FROM fh)
        SELECT count(CASE WHEN bloom_pass = 1 THEN 1 END) AS n_bloom_pass,
          count(CASE WHEN is_match = 1 THEN 1 END) AS n_exact,
          count(CASE WHEN bloom_pass = 1 AND is_match = 0 THEN 1 END) AS n_false_pos,
          count(CASE WHEN bloom_pass = 0 AND is_match = 1 THEN 1 END) AS n_false_neg
        FROM flagged"""
      },
    ),

    // ------------------------------------------------------------------
    // Z-order (Morton) layout clustering: scale (l_partkey, l_suppkey) to
    // 16-bit rank space, interleave bits, bucket by the top Z bits. The
    // per-bucket min/max ranges of BOTH dimensions stay narrow — exactly
    // the file-level statistics a lakehouse layout uses for
    // multi-dimensional data skipping (either predicate prunes buckets).
    // Pure integer bit math → identical in any engine.
    GraftQuery(
      "layout01_zorder",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        val mx = li.agg(max(col("l_partkey")).as("mp"), max(col("l_suppkey")).as("ms"))
        val scaled = li.crossJoin(broadcast(mx))
          .withColumn("p16", expr("(l_partkey * 65536) div (mp + 1)"))
          .withColumn("s16", expr("(l_suppkey * 65536) div (ms + 1)"))
          .withColumn("z", expr(sparkMorton("p16", "s16")))
          .withColumn("bucket", shiftright(col("z"), 26))
        scaled.groupBy(col("bucket")).agg(
          count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      },
      Some(s"""WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
          scaled AS (SELECT l_partkey, l_suppkey,
              (l_partkey * 65536) // (mp + 1) AS p16,
              (l_suppkey * 65536) // (ms + 1) AS s16
            FROM lineitem, mx),
          z AS (SELECT l_partkey, l_suppkey,
              (${duckMorton("p16", "s16")}) >> 26 AS bucket
            FROM scaled)
        SELECT bucket, count(*) AS n,
          min(l_partkey) AS p_min, max(l_partkey) AS p_max,
          min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
        FROM z GROUP BY bucket"""),
    ),

    // ------------------------------------------------------------------
    // Stratified hash sampling: per-language rates (downsample the dominant
    // language, keep the tail) via the same deterministic md5 threshold as
    // samp01 — reproducible on any engine/cluster, no RNG state, and the
    // scan only reads the id + stratum columns. The standard
    // rebalance-by-source step of a training-data mix.
    GraftQuery(
      "samp02_stratified",
      (s, d) => {
        val rateBp = expr("""CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 5000
          WHEN 'es' THEN 2000 WHEN 'de' THEN 10000 ELSE 1000 END""")
        val pass = TA.hash60(concat(lit("strat:"), col("doc_id").cast("string"))) % 10000 < rateBp
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"), count(when(pass, lit(1))).as("n_sampled"))
      },
      Some {
        val h = sqlHash60("concat('strat:', CAST(doc_id AS VARCHAR))")
        s"""SELECT lang, count(*) AS n_total,
          count(CASE WHEN $h % 10000 <
            CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 5000
              WHEN 'es' THEN 2000 WHEN 'de' THEN 10000 ELSE 1000 END
          THEN 1 END) AS n_sampled
        FROM documents GROUP BY lang"""
      },
    ),

    // ------------------------------------------------------------------
    // SRP (signed-random-projection / hyperplane) LSH for cosine ANN — the
    // Hamming-space alternative to IVF (sim02): 16 deterministic md5-derived
    // integer hyperplanes → 16-bit signature; equal signatures form
    // candidate buckets (equi-join, shuffle-partitioned, no N² pair work);
    // candidates re-rank by exact cosine. At billion-vector scale the
    // signature is the shuffle key and the exact re-rank touches only
    // same-bucket collisions.
    GraftQuery(
      "sim04_srp_lsh",
      (s, d) => {
        // banded probing (4 bands × 4 bits), same shape as MinHash-LSH: a
        // full 16-bit exact-signature match has near-zero recall at realistic
        // angles — candidates are pairs agreeing on ANY band, then exact
        // cosine re-ranks. Collision work stays linear: band keys are the
        // shuffle keys, never an N² comparison.
        val weights = srpWeights(16, 64)
        val e = Tables.embeddings(s, d)
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("vec_id").as("id"), Similarity.toDouble(col("embedding")).as("v"))
          .withColumn("sig", srpSignature(col("v"), weights))
          .withColumn("nrm", Similarity.norm(col("v")))
          .persist()
        val banded = e.select(col("id"), col("v"), col("nrm"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), 4 * b).bitwiseAND(lit(15)).as("key"))
          }: _*)).as("bk"))
          .select(col("id"), col("v"), col("nrm"), col("bk.band"), col("bk.key"))
        val q = banded.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("v").as("q_v"), col("nrm").as("q_n"),
            col("band"), col("key"))
        val cand = broadcast(q).join(banded, Seq("band", "key"))
          .filter(col("q_id") =!= col("id"))
          .select(col("q_id"), col("id").as("n_id"), col("q_v"), col("v"),
            col("q_n"), col("nrm"))
          .distinct()
          .select(col("q_id"), col("n_id"),
            (Similarity.dot(col("q_v"), col("v")) / (col("q_n") * col("nrm"))).as("cos"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        cand.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      },
      Some {
        val sig = sqlSrpSignature("v", 16, 64)
        val bandJoins = (0 until 4).map { b =>
          s"""SELECT q.id AS q_id, n.id AS n_id FROM sigs q JOIN sigs n
            ON q.id < 20 AND q.id <> n.id
            AND ((q.sig >> ${4 * b}) & 15) = ((n.sig >> ${4 * b}) & 15)"""
        }.mkString(" UNION ")
        s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
          sigs AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm, $sig AS sig FROM e),
          pairs AS ($bandJoins),
          cand AS (SELECT p.q_id, p.n_id,
              list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS cos
            FROM pairs p JOIN sigs q ON q.id = p.q_id JOIN sigs n ON n.id = p.n_id)
        SELECT q_id, n_id, cos, rnk FROM (
          SELECT q_id, n_id, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
          FROM cand)
        WHERE rnk <= 3"""
      },
    ),

    // ------------------------------------------------------------------
    // Stream-stream interval join (batch-equivalent oracle): click events
    // joined to the same user's purchases within the next 4 hours. The
    // IDENTICAL join runs under Structured Streaming with watermarks on
    // both sides (StreamStreamJoinSpec asserts parity) — state is bounded
    // by the watermark + interval, the batch form is a range join.
    GraftQuery(
      "ev10_interval_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        clicks.join(purchases,
            col("user_id") === col("p_user_id") &&
              col("purchase_ts") >= col("click_ts") &&
              col("purchase_ts") < col("click_ts") + expr("INTERVAL 4 HOURS"))
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
          epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM events c JOIN events p
          ON c.user_id = p.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 4 HOUR"""),
    ),
  )
}
