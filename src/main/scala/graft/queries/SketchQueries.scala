package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Sketches, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-sketch operators, split out of ScaleQueries in round 14
  * (pack-size hygiene; queries and oracles byte-identical to their
  * pre-split forms): KMV distinct-count (sketch01) and its typed
  * aggregator twin (sketch04), count-min top-k (sketch02), Bloom
  * pre-join filtering (sketch03), HLL register estimation (sketch05),
  * and the streaming histogram quantile (sketch06). Every sketch has an
  * EXACT deterministic oracle — see [[graft.ops.Sketches]].
  */
object SketchQueries {

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
          // under-capacity sketch holds EVERY distinct hash → exact count;
          // keeps the three-implementations-one-answer contract with
          // sketch04's Aggregator (whose finish() has the same branch)
          .withColumn("est_distinct",
            when(col("k") < 256, col("k"))
              .otherwise(kmvEstimate(col("k"), col("kth_min"))))
          .crossJoin(exact)
      },
      Some {
        val h = sqlHash60("CAST(l_partkey AS VARCHAR)")
        s"""WITH b AS (SELECT DISTINCT $h AS h FROM lineitem ORDER BY h ASC LIMIT 256)
          SELECT count(*) AS k, max(h) AS kth_min,
            CASE WHEN count(*) < 256 THEN count(*)
              ELSE ${sqlKmvEstimate("count(*)", "max(h)")} END AS est_distinct,
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
        val CmDepth = 4
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
            explode(array((0 until CmDepth).map { j =>
              struct(lit(j).as("j"), (hashSlice(col("hex"), j) % W).as("b"))
            }: _*)).as("e"))
          .select(col("l_partkey"), col("exact_cnt"), col("e.j"), col("e.b"))
          .transform(graft.core.Caches.persist)
        val sketch = keyed.groupBy(col("j"), col("b"))
          .agg(sum(col("exact_cnt")).as("c"))
        val est = keyed
          .join(broadcast(sketch), Seq("j", "b"))
          .groupBy(col("l_partkey"), col("exact_cnt")).agg(min(col("c")).as("est_cnt"))
        // top-10 via TakeOrdered, then rank the 10 survivors with a
        // k-bounded window — the per-key estimate table is ~|partkeys|
        // rows (~20M at sf100), far too large for a single-task global
        // rank window. Same pattern as vocab03.
        val w = Window.orderBy(col("est_cnt").desc, col("l_partkey").asc)
        est.orderBy(col("est_cnt").desc, col("l_partkey").asc).limit(10)
          .withColumn("rnk", row_number().over(w))
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
    // HyperLogLog distinct-count over l_orderkey: 512 registers, each the
    // max leading-zero rank of the md5-hash suffix. The register table is
    // ONE map-side-combinable groupBy into ≤512 cells regardless of key
    // cardinality — at 100 TB the registers merge across any partitioning,
    // unlike exact countDistinct's full shuffle. The register sum is scaled
    // to an exact integer (Σ 2^(52-M_j), every term a power of two ≤ 2^52,
    // m·2^52 < 2^63), so the harmonic mean — and hence the estimate — is
    // bit-identical in any engine; only the final constant·m²/S division is
    // floating point, performed once in the same order. Raw HLL formula, no
    // small/large-range correction (documented; n ≫ 2.5m in all test SFs).
    GraftQuery(
      "sketch05_hll",
      (s, d) => {
        val m = 512
        // alpha_m · m² · 2^52 (the hash suffix h div 512 is 51 bits wide,
        // so rho ∈ [1, 52]), folded to one literal so both engines parse
        // the identical decimal constant
        val c = 0.7213 / (1 + 1.079 / m) * m * m * 4503599627370496.0
        val regs = Tables.lineitem(s, d)
          .select(TA.hash60(concat(lit("hll:"), col("l_orderkey").cast("string"))).as("h"))
          .select((col("h") % m).as("bucket"), expr(s"h div $m").as("rest"))
          .select(col("bucket"), when(col("rest") === 0, lit(52))
            .otherwise(lit(52) - length(bin(col("rest")))).as("rho"))
          .groupBy(col("bucket")).agg(max(col("rho")).as("mrho"))
        val full = s.range(m).select(col("id").as("bucket"))
          .join(regs, Seq("bucket"), "left")
          .select(coalesce(col("mrho"), lit(0)).as("mrho"))
        val sums = full.agg(
          sum(expr("shiftleft(1L, cast(52 - mrho as int))")).as("s"),
          count(when(col("mrho") === 0, lit(1))).as("n_empty"))
        val exact = Tables.lineitem(s, d)
          .agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        sums.select(
            round(lit(c) / col("s").cast("double")).cast("long").as("est_distinct"),
            col("n_empty"))
          .crossJoin(exact)
      },
      Some {
        val h = sqlHash60("concat('hll:', CAST(l_orderkey AS VARCHAR))")
        val c = 0.7213 / (1 + 1.079 / 512) * 512 * 512 * 4503599627370496.0
        s"""WITH r AS (SELECT h % 512 AS bucket, h // 512 AS rest
              FROM (SELECT $h AS h FROM lineitem)),
          regs AS (SELECT bucket,
              max(CASE WHEN rest = 0 THEN 52
                  ELSE 52 - length(format('{:b}', rest)) END) AS mrho
            FROM r GROUP BY 1),
          filled AS (SELECT coalesce(mrho, 0) AS mrho
            FROM (SELECT range AS bucket FROM range(512)) b LEFT JOIN regs USING (bucket)),
          agg AS (SELECT CAST(sum(1::BIGINT << CAST(52 - mrho AS INT)) AS BIGINT) AS s,
              count(CASE WHEN mrho = 0 THEN 1 END) AS n_empty
            FROM filled)
        SELECT CAST(round($c / CAST(s AS DOUBLE)) AS BIGINT) AS est_distinct, n_empty,
          (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS exact_distinct
        FROM agg"""
      },
    ),

    // ------------------------------------------------------------------
    // Histogram-sketch quantiles: fixed-width bins over integer cents (one
    // map-side-combinable groupBy into ~100 cells), cumulative counts over
    // the tiny bin table, linear interpolation inside the target bin. The
    // standard approximate-quantile layout at 100 TB — the full-data pass is
    // a counting aggregation, never a sort — with the exact percentile
    // (q16's engine-exact pair) alongside to show the error. All bin math is
    // integer; the interpolation divides identical exact integers in the
    // same order, so est is bit-identical cross-engine.
    GraftQuery(
      "sketch06_hist_quantile",
      (s, d) => {
        val W = 102400L // bin width in cents ($1024)
        val li = Tables.lineitem(s, d)
          .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val bins = li.groupBy(expr(s"cents div $W").as("bin"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("bin"))
        val cum = bins.withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("cumb", col("cum") - col("cnt"))
        val totals = li.agg(count(lit(1)).as("n"),
          expr("percentile(cents, 0.5D)").as("ex50"),
          expr("percentile(cents, 0.9D)").as("ex90"),
          expr("percentile(cents, 0.99D)").as("ex99"))
        val qs = s.range(1)
          .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
          .crossJoin(broadcast(totals))
          .withColumn("t", ceil(col("q") * col("n")).cast("long"))
        qs.join(broadcast(cum), col("cumb") < col("t") && col("t") <= col("cum"))
          .select(col("q"),
            (((col("bin") * W).cast("double") +
              lit(W.toDouble) * ((col("t") - col("cumb")) / col("cnt"))) / lit(100.0)).as("est"),
            (when(col("q") === 0.5, col("ex50"))
              .when(col("q") === 0.9, col("ex90"))
              .otherwise(col("ex99")) / lit(100.0)).as("exact"))
      },
      Some("""WITH cents AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem),
          bins AS (SELECT cents // 102400 AS bin, count(*) AS cnt FROM cents GROUP BY 1),
          cum AS (SELECT bin, cnt,
              CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
              CAST(sum(cnt) OVER (ORDER BY bin) - cnt AS BIGINT) AS cumb
            FROM bins),
          tot AS (SELECT count(*) AS n, quantile_cont(cents, 0.5) AS ex50,
              quantile_cont(cents, 0.9) AS ex90, quantile_cont(cents, 0.99) AS ex99
            FROM cents),
          qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
          tq AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS t, ex50, ex90, ex99 FROM qs, tot)
        SELECT q,
          (CAST(bin * 102400 AS DOUBLE) + 102400.0 * ((t - cumb) / cnt)) / 100.0 AS est,
          (CASE WHEN q = 0.5 THEN ex50 WHEN q = 0.9 THEN ex90 ELSE ex99 END) / 100.0 AS exact
        FROM tq JOIN cum ON cumb < t AND t <= cum"""),
    ),

  )
}
