package graft.queries

import graft.core.{Determinism => D, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational WINDOW / set-op / scalar-function families (q20-q38), split
  * out of RelationalQueries in round 15 (registry hygiene at the ~1000-LoC
  * pack bound; query bodies byte-identical). Same design-for-scale notes
  * as RelationalQueries.
  */
object RelationalFnQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // q20: lead/lag + first_value window battery over orders per customer.
    GraftQuery(
      "q20_window_lead_lag",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        Tables.orders(s, d)
          .select($"o_custkey", $"o_orderkey", $"o_orderdate")
          .withColumn("prev_order", lag($"o_orderkey", 1).over(w))
          .withColumn("next_order", lead($"o_orderkey", 1).over(w))
          .withColumn("first_order", first($"o_orderkey").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("order_seq", row_number().over(w))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        lag(o_orderkey, 1) OVER w AS prev_order,
        lead(o_orderkey, 1) OVER w AS next_order,
        first_value(o_orderkey) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order,
        row_number() OVER w AS order_seq
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""),
    ),

    // ------------------------------------------------------------------
    // q21: INTERSECT / EXCEPT set operations on key projections.
    GraftQuery(
      "q21_setops",
      (s, d) => {
        import s.implicits._
        val ordered = Tables.orders(s, d).select($"o_custkey".as("k"))
        val heavy = Tables.orders(s, d).filter($"o_totalprice" > 300000.0)
          .select($"o_custkey".as("k"))
        val both = ordered.intersect(heavy).withColumn("src", lit("both"))
        val onlyLight = ordered.except(heavy).withColumn("src", lit("light_only"))
        both.unionByName(onlyLight)
          .groupBy($"src").agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT src, count(*) AS n_customers FROM (
          SELECT k, 'both' AS src FROM (
            SELECT o_custkey AS k FROM orders
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
          UNION ALL
          SELECT k, 'light_only' FROM (
            SELECT o_custkey AS k FROM orders
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0))
        GROUP BY src"""),
    ),

    // ------------------------------------------------------------------
    // q22: array-function battery (split/sort/distinct/contains/slice).
    GraftQuery(
      "q22_array_funcs",
      (s, d) => {
        import s.implicits._
        val toks = split($"p_type", " ")
        Tables.part(s, d).select(
          $"p_partkey",
          size(toks).as("n_words"),
          array_join(sort_array(toks), "|").as("sorted_words"),
          array_contains(toks, "BRUSHED").cast("int").as("has_brushed"),
          element_at(toks, 1).as("first_word"),
          element_at(toks, -1).as("last_word"),
          size(array_distinct(toks)).as("n_distinct_words"))
      },
      Some("""SELECT p_partkey,
          len(string_split(p_type, ' ')) AS n_words,
          array_to_string(list_sort(string_split(p_type, ' ')), '|') AS sorted_words,
          CAST(list_contains(string_split(p_type, ' '), 'BRUSHED') AS INT) AS has_brushed,
          string_split(p_type, ' ')[1] AS first_word,
          string_split(p_type, ' ')[-1] AS last_word,
          len(list_distinct(string_split(p_type, ' '))) AS n_distinct_words
        FROM part"""),
    ),

    // ------------------------------------------------------------------
    // q23: math battery (IEEE-exact ops only: abs/ceil/floor/sqrt/sign/mod).
    GraftQuery(
      "q23_math_funcs",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d).select(
          $"l_orderkey", $"l_linenumber",
          abs($"l_extendedprice" - 50000.0).as("abs_dev"),
          ceil($"l_quantity").cast("long").as("qty_ceil"),
          floor($"l_extendedprice" / 1000.0).cast("long").as("price_k"),
          sqrt($"l_extendedprice").as("price_sqrt"),
          signum($"l_discount" - 0.05).as("disc_sign"),
          ($"l_orderkey" % 97).as("key_mod"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
          abs(l_extendedprice - 50000.0) AS abs_dev,
          CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
          CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
          sqrt(l_extendedprice) AS price_sqrt,
          CASE WHEN l_discount - 0.05 > 0 THEN 1.0
               WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign,
          l_orderkey % 97 AS key_mod
        FROM lineitem"""),
    ),

    // ------------------------------------------------------------------
    // q24: union by name with missing columns (schema evolution union).
    GraftQuery(
      "q24_union_by_name",
      (s, d) => {
        import s.implicits._
        val v1 = Tables.orders(s, d).filter($"o_orderkey" % 3 === 0)
          .select($"o_orderkey", $"o_orderstatus")
        val v2 = Tables.orders(s, d).filter($"o_orderkey" % 3 === 1)
          .select($"o_orderkey", $"o_totalprice")
        v1.unionByName(v2, allowMissingColumns = true)
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), D.intSum(coalesce($"o_totalprice", lit(0.0))).as("total"))
      },
      Some(s"""SELECT o_orderstatus, count(*) AS n,
        ${D.sqlIntSum("coalesce(o_totalprice, 0.0)")} AS total
        FROM (
          SELECT o_orderkey, o_orderstatus, NULL::DOUBLE AS o_totalprice
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL BY NAME
          SELECT o_orderkey, NULL::VARCHAR AS o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 3 = 1)
        GROUP BY o_orderstatus"""),
    ),

    // ------------------------------------------------------------------
    // q25: regexp_extract_all + explode (multi-match extraction).
    GraftQuery(
      "q25_regexp_extract_all",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"lang", explode(
            regexp_extract_all($"text", lit("\\b[a-z]{5,}\\b"), lit(0))).as("word"))
          .groupBy($"lang", $"word")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT lang, word, count(*) AS n FROM (
          SELECT lang, unnest(regexp_extract_all(text, '\b[a-z]{5,}\b')) AS word
          FROM documents) GROUP BY lang, word"""),
    ),

    // ------------------------------------------------------------------
    // q26: arg-max/min with a deterministic composite ordering key.
    GraftQuery(
      "q26_argmax",
      (s, d) => {
        import s.implicits._
        // unique 64-bit ordering key: price-in-cents * 1e6 + partkey
        val ord = (round($"p_retailprice" * 100).cast("long") * 1000000L + $"p_partkey")
        Tables.part(s, d)
          .groupBy($"p_brand")
          .agg(
            max_by($"p_partkey", ord).as("priciest_part"),
            min_by($"p_partkey", ord).as("cheapest_part"),
            max(ord).as("max_ord"))
      },
      Some("""SELECT p_brand,
          arg_max(p_partkey, CAST(round(p_retailprice*100) AS BIGINT)*1000000 + p_partkey) AS priciest_part,
          arg_min(p_partkey, CAST(round(p_retailprice*100) AS BIGINT)*1000000 + p_partkey) AS cheapest_part,
          max(CAST(round(p_retailprice*100) AS BIGINT)*1000000 + p_partkey) AS max_ord
        FROM part GROUP BY p_brand"""),
    ),

    // ------------------------------------------------------------------
    // q27: unpivot (stack) of the lineitem measures → long format sums.
    GraftQuery(
      "q27_unpivot",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select($"l_returnflag",
            expr("stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount)")
              .as(Seq("measure", "v")))
          .groupBy($"l_returnflag", $"measure")
          .agg(D.intSum($"v", 4).as("total"))
      },
      Some(s"""SELECT l_returnflag, measure, ${D.sqlIntSum("v", 4)} AS total
        FROM (
          SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
          UNION ALL SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
          UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem)
        GROUP BY l_returnflag, measure"""),
    ),

    // ------------------------------------------------------------------
    // q28: explicit GROUPING SETS (cube/rollup's general form) + grouping()
    // flags to disambiguate the null rows.
    GraftQuery(
      "q28_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
            $"o_orderstatus", $"o_orderpriority")
          .agg(
            grouping($"o_orderstatus").cast("long").as("g_status"),
            grouping($"o_orderpriority").cast("long").as("g_prio"),
            count(lit(1)).as("n"),
            D.intSum($"o_totalprice").as("total"))
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          count(*) AS n, ${D.sqlIntSum("o_totalprice")} AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""),
    ),

    // ------------------------------------------------------------------
    // q29: ranking-window family — ntile buckets, percent_rank, cume_dist
    // over per-nation balances (ties broken by key for determinism).
    GraftQuery(
      "q29_window_ranks",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".asc, $"c_custkey".asc)
        Tables.customer(s, d).select(
          $"c_nationkey", $"c_custkey",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
      },
      Some("""SELECT c_nationkey, c_custkey,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)"""),
    ),

    // ------------------------------------------------------------------
    // q30: struct/map function family — struct build + compact-JSON render
    // (Spark to_json == DuckDB to_json(struct_pack) byte-for-byte), map
    // build, scalar lookup, key list, cardinality.
    GraftQuery(
      "q30_struct_map_funcs",
      (s, d) => {
        import s.implicits._
        val m = map(lit("qty"), $"l_quantity", lit("disc"), $"l_discount")
        Tables.lineitem(s, d).select(
          $"l_orderkey", $"l_linenumber",
          to_json(struct($"l_quantity".as("q"), $"l_returnflag".as("f"))).as("js"),
          element_at(m, "qty").as("qty_val"),
          concat_ws(",", map_keys(m)).as("keys"),
          size(m).cast("long").as("n_keys"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
          to_json(struct_pack(q := l_quantity, f := l_returnflag)) AS js,
          (MAP {'qty': l_quantity, 'disc': l_discount}['qty'])[1] AS qty_val,
          array_to_string(map_keys(MAP {'qty': l_quantity, 'disc': l_discount}), ',') AS keys,
          CAST(cardinality(MAP {'qty': l_quantity, 'disc': l_discount}) AS BIGINT) AS n_keys
        FROM lineitem"""),
    ),

    // ------------------------------------------------------------------
    // q32: date/time function family — calendar parts, week-day numbering
    // (Spark 1=Sunday vs DuckDB 0=Sunday, aligned with +1), month end,
    // interval arithmetic, calendar-day differences.
    GraftQuery(
      "q32_date_funcs",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d).select(
          $"o_orderkey",
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          dayofmonth($"o_orderdate").cast("long").as("dom"),
          dayofweek($"o_orderdate").cast("long").as("dw"),
          quarter($"o_orderdate").cast("long").as("q"),
          last_day($"o_orderdate").as("ld"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("d30"),
          datediff(lit("1998-12-01").cast("date"), $"o_orderdate")
            .cast("long").as("days_to_end"))
      },
      Some("""SELECT o_orderkey,
          CAST(year(o_orderdate) AS BIGINT) AS y,
          CAST(month(o_orderdate) AS BIGINT) AS m,
          CAST(day(o_orderdate) AS BIGINT) AS dom,
          CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dw,
          CAST(quarter(o_orderdate) AS BIGINT) AS q,
          last_day(o_orderdate) AS ld,
          o_orderdate + INTERVAL 30 DAY AS d30,
          CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT) AS days_to_end
        FROM orders"""),
    ),

    // ------------------------------------------------------------------
    // q31: statistical aggregates (variance / stddev / covariance /
    // correlation) computed from EXACT integer power sums — built-in
    // stddev/corr accumulate floats in partition order and never
    // hash-match across engines; power sums are order-independent 64-bit
    // integers, and both engines then evaluate the identical closed-form
    // double expression, so the results are bit-identical. This is also
    // the scalable shape: one map-side-combined aggregation pass.
    GraftQuery(
      "q31_stats_family",
      (s, d) => {
        import s.implicits._
        // integer-valued per row (products fit long: y² ≤ ~1.2e10); the SUMS
        // accumulate as decimal(38,0) — exact and order-independent at ANY
        // scale factor (an int64 sum of y² would wrap silently around
        // sf~250, while the DuckDB oracle's HUGEINT survives — divergence
        // exactly at the scale this engine targets)
        val x = round($"l_quantity").cast("long")
        val y = round($"l_extendedprice").cast("long")
        def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
        val agged = Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            dsum(x).as("sx"), dsum(x * x).as("sxx"),
            dsum(y).as("sy"), dsum(y * y).as("syy"),
            dsum(x * y).as("sxy"))
        val n = $"n".cast("double")
        val (sx, sxx, sy, syy, sxy) = ($"sx".cast("double"), $"sxx".cast("double"),
          $"sy".cast("double"), $"syy".cast("double"), $"sxy".cast("double"))
        agged.select(
          $"l_returnflag", $"n",
          ((sxx - sx * sx / n) / (n - 1.0)).as("var_qty"),
          sqrt((sxx - sx * sx / n) / (n - 1.0)).as("sd_qty"),
          ((sxy - sx * sy / n) / (n - 1.0)).as("covar"),
          ((sxy - sx * sy / n) /
            sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr"))
      },
      Some("""WITH a AS (
          SELECT l_returnflag, count(*) AS n,
            sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
            sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS sxx,
            sum(CAST(round(l_extendedprice) AS BIGINT)) AS sy,
            sum(CAST(round(l_extendedprice) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS syy,
            sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_qty,
          sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS sd_qty,
          (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS covar,
          (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) /
            sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))) AS corr
        FROM a"""),
    ),

    // ------------------------------------------------------------------
    // q33: ORDERED string aggregation. Distributed collect_list has no
    // deterministic order, so the scalable deterministic form is
    // sort_array(collect_list(struct(orderKey, value))) → transform →
    // array_join; DuckDB's native string_agg(... ORDER BY) is the oracle.
    GraftQuery(
      "q33_string_agg",
      (s, d) => {
        import s.implicits._
        val top = Tables.supplier(s, d)
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"s_nationkey")
              .orderBy($"s_acctbal".desc, $"s_suppkey".asc)))
          .filter($"rnk" <= 3)
        top.groupBy($"s_nationkey")
          .agg(array_join(
            transform(
              sort_array(collect_list(struct($"rnk", $"s_name"))),
              e => e.getField("s_name")),
            ",").as("top_suppliers"))
      },
      Some("""SELECT s_nationkey, string_agg(s_name, ',' ORDER BY rnk) AS top_suppliers
        FROM (
          SELECT s_nationkey, s_name,
            row_number() OVER (PARTITION BY s_nationkey
              ORDER BY s_acctbal DESC, s_suppkey ASC) AS rnk
          FROM supplier)
        WHERE rnk <= 3 GROUP BY s_nationkey"""),
    ),

    // ------------------------------------------------------------------
    // q34: boolean + bitwise aggregate family (bool_and/bool_or,
    // bit_and/bit_or/bit_xor) — integer/boolean-exact in any engine.
    GraftQuery(
      "q34_bool_bit_aggs",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("bool_and(l_quantity > 0)").as("all_qty_pos"),
          expr("bool_or(l_discount > 0.05)").as("any_big_disc"),
          expr("bit_and(l_orderkey)").as("and_okey"),
          expr("bit_or(l_suppkey)").as("or_skey"),
          expr("bit_xor(l_partkey)").as("xor_pkey")),
      Some("""SELECT l_returnflag,
          bool_and(l_quantity > 0) AS all_qty_pos,
          bool_or(l_discount > 0.05) AS any_big_disc,
          bit_and(l_orderkey) AS and_okey,
          bit_or(l_suppkey) AS or_skey,
          bit_xor(l_partkey) AS xor_pkey
        FROM lineitem GROUP BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // q35: DYNAMIC pivot — the pivot values are discovered from the data
    // (one small distinct job on the driver), not declared like q12's
    // conditional pivot. Spark's groupBy().pivot(col) is the idiomatic
    // form; the oracle spells the discovered columns out. Pivot-count holes
    // are coalesced to 0 (Spark emits null for absent combinations,
    // SQL count() emits 0). Spaces in values are sanitized to '_' so the
    // column names stay parquet-legal.
    GraftQuery(
      "q35_dynamic_pivot",
      (s, d) => {
        val o = Tables.orders(s, d)
          .withColumn("prio", regexp_replace(col("o_orderpriority"), " ", "_"))
          .withColumn("yr", year(col("o_orderdate")))
        val p = o.groupBy(col("yr")).pivot("prio").agg(count(lit(1)))
        p.select(col("yr") +: p.columns.filter(_ != "yr").sorted.map(c =>
          coalesce(col(s"`$c`"), lit(0L)).as(c)): _*)
      },
      Some {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT_SPECIFIED", "5-LOW")
        val cols = prios.map(p =>
          s"""count(CASE WHEN replace(o_orderpriority, ' ', '_') = '$p' THEN 1 END) AS "$p"""")
          .mkString(", ")
        s"""SELECT year(o_orderdate) AS yr, $cols FROM orders GROUP BY 1"""
      },
    ),

    // ------------------------------------------------------------------
    // Statistical mode per group (pandas .mode / Presto mode()) — Spark has
    // no modal aggregate, so it composes as count-then-rank with a TOTAL
    // tie order (count desc, value asc). Two keyed aggregations; the
    // value-level counts partial-aggregate map-side, and the rank window's
    // partition count is the GROUP count — at 100 TB the ranked relation is
    // (groups × distinct values), never row-scale.
    GraftQuery(
      "q36_mode",
      (s, d) => {
        val counts = Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("yr"))
          .orderBy(col("n").desc, col("o_orderpriority").asc)
        counts
          .withColumn("rn", row_number().over(w))
          .withColumn("n_group", sum(col("n")).over(
            Window.partitionBy(col("yr"))))
          .filter(col("rn") === 1)
          .select(col("yr"), col("o_orderpriority").as("mode_priority"),
            col("n").as("n_mode"), col("n_group"),
            round(col("n") * 1000000.0 / col("n_group")).cast("long").as("share_ppm"))
      },
      Some("""WITH c AS (SELECT year(o_orderdate) AS yr, o_orderpriority,
              count(*) AS n
            FROM orders GROUP BY 1, 2),
          r AS (SELECT yr, o_orderpriority, n,
              row_number() OVER (PARTITION BY yr
                ORDER BY n DESC, o_orderpriority ASC) AS rn,
              CAST(sum(n) OVER (PARTITION BY yr) AS BIGINT) AS n_group
            FROM c)
        SELECT yr, o_orderpriority AS mode_priority, n AS n_mode, n_group,
          CAST(round(n * 1000000.0e0 / n_group) AS BIGINT) AS share_ppm
        FROM r WHERE rn = 1"""),
    ),

    // ------------------------------------------------------------------
    // Time-RANGE window frame (not a row frame): per user, the trailing
    // 1-hour event-value sum and event count AT EVERY EVENT — the
    // rate-limiter / rolling-exposure shape. The frame is defined on the
    // ORDER VALUE (µs since epoch), so same-timestamp peers are all in
    // frame in both engines regardless of row order; the sum is exact
    // integer cents. One user_id shuffle, partition-local ordered scan —
    // at 100 TB the state per partition is the 1-hour horizon, never the
    // full history.
    GraftQuery(
      "q37_trailing_window",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("trail_cents", sum(col("cents")).over(w))
          .withColumn("n_in_window", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("us"),
            col("trail_cents"), col("n_in_window"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
          CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT)
            AS trail_cents,
          count(*) OVER w AS n_in_window
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""),
    ),

    // ------------------------------------------------------------------
    // LATERAL correlated subquery with per-row ORDER BY + LIMIT (the
    // SQL:1999 lateral-join surface; Catalyst decorrelates the limit
    // into a partitioned rank under the hood). Top-3 customers by
    // balance per nation — the same answer a window rank produces (q29
    // family), pinned here through the LATERAL entry path because it is
    // a distinct operator a SQL user reaches for.
    GraftQuery(
      "q38_lateral_topn",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("g38_nation")
        Tables.customer(s, d).createOrReplaceTempView("g38_customer")
        s.sql("""
          SELECT n.n_name AS nation, t.custkey, t.bal_cents
          FROM g38_nation n,
          LATERAL (
            SELECT c_custkey AS custkey,
              CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM g38_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY bal_cents DESC, custkey
            LIMIT 3
          ) t""")
      },
      Some("""SELECT n.n_name AS nation, t.custkey, t.bal_cents
        FROM nation n,
        LATERAL (
          SELECT c_custkey AS custkey,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, custkey
          LIMIT 3
        ) t"""),
    ),
  )
}
