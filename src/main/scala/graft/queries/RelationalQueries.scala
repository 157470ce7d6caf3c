package graft.queries

import graft.core.{Determinism => D, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query pack over the TPC-H-ish star schema.
  *
  * Design-for-scale notes (local[32] tests, 100 TB target):
  *  - dimension tables (region/nation/part/supplier/customer at their SFs) are
  *    broadcast explicitly so the fact-side scan never shuffles for them;
  *  - aggregations are plain groupBy → Catalyst does partial (map-side)
  *    aggregation before the single hash-partition shuffle;
  *  - floating sums use Determinism.intSum (exact 64-bit integer adds) which
  *    is both cross-engine-reproducible AND faster than decimal arithmetic;
  *  - no collect()s; every query is one lazy DAG.
  */
object RelationalQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // q01: TPC-H Q1-style pricing summary. Full lineitem scan, 2-key agg.
    GraftQuery(
      "q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            D.intSum($"l_quantity").as("sum_qty"),
            D.intSum($"l_extendedprice").as("sum_base_price"),
            D.intSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
            D.intAvg($"l_quantity").as("avg_qty"),
            D.intAvg($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${D.sqlIntSum("l_quantity")} AS sum_qty,
        ${D.sqlIntSum("l_extendedprice")} AS sum_base_price,
        ${D.sqlIntSum("l_extendedprice*(1.0-l_discount)", 4)} AS sum_disc_price,
        ${D.sqlIntAvg("l_quantity")} AS avg_qty,
        ${D.sqlIntAvg("l_discount")} AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus"""),
    ),

    // ------------------------------------------------------------------
    // q02: revenue per nation — 3-way fact join + broadcast dims.
    GraftQuery(
      "q02_revenue_by_nation",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        // orders⋈customer is key-to-key; nation is tiny → broadcast.
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            D.intSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name,
        ${D.sqlIntSum("l_extendedprice*(1.0-l_discount)", 4)} AS revenue,
        count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name"""),
    ),

    // ------------------------------------------------------------------
    // q03: window rank — top-3 parts per brand (deterministic tiebreak).
    GraftQuery(
      "q03_top_parts_per_brand",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand")
          .orderBy($"p_retailprice".desc, $"p_partkey".asc)
        Tables.part(s, d)
          .select($"p_brand", $"p_partkey", $"p_retailprice")
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
        FROM part) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // q04: left-semi join (EXISTS) — orders having any heavy line.
    GraftQuery(
      "q04_orders_with_heavy_lines",
      (s, d) => {
        import s.implicits._
        val heavy = Tables.lineitem(s, d)
          .filter($"l_quantity" > 45).select($"l_orderkey")
        Tables.orders(s, d)
          .join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority"""),
    ),

    // ------------------------------------------------------------------
    // q05: left-anti join (NOT EXISTS) — customers with no large order.
    // (Every customer has SOME order in this data; the price filter keeps
    // the anti-join result non-empty so the oracle check has teeth.)
    GraftQuery(
      "q05_customers_without_large_orders",
      (s, d) => {
        import s.implicits._
        val big = Tables.orders(s, d)
          .filter($"o_totalprice" > 300000.0).select($"o_custkey")
        Tables.customer(s, d)
          .join(big, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        GROUP BY c_mktsegment"""),
    ),

    // ------------------------------------------------------------------
    // q06: running total per supplier (window frame, unique sort key).
    GraftQuery(
      "q06_running_revenue_per_supplier",
      (s, d) => {
        import s.implicits._
        // (orderkey, linenumber) is NOT unique in this data — the summed
        // cents value is the final tiebreak, which makes the running sum
        // order-independent across remaining ties (equal rows commute).
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
            round($"l_extendedprice" * 100).cast("long").as("cents"))
          .withColumn("running_revenue", sum($"cents").over(w) / lit(100.0))
          .drop("cents")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        sum(CAST(round(l_extendedprice*100) AS BIGINT)) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT)
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0
          AS running_revenue
        FROM lineitem"""),
    ),

    // ------------------------------------------------------------------
    // q07: ROLLUP over two keys (grouping sets).
    GraftQuery(
      "q07_rollup_returnflag_status",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n_rows"), D.intSum($"l_quantity").as("sum_qty"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        ${D.sqlIntSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
    ),

    // ------------------------------------------------------------------
    // q08: date_trunc month aggregation over orders.
    GraftQuery(
      "q08_monthly_order_volume",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            D.intSum($"o_totalprice").as("total_price"))
      },
      Some(s"""SELECT date_trunc('month', o_orderdate) AS month,
        count(*) AS n_orders, ${D.sqlIntSum("o_totalprice")} AS total_price
        FROM orders GROUP BY 1"""),
    ),

    // ------------------------------------------------------------------
    // q09: global top-k with deterministic tiebreak (sort + limit).
    GraftQuery(
      "q09_top10_orders",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
    ),

    // ------------------------------------------------------------------
    // q10: distinct aggregation — distribution of distinct parts per order.
    GraftQuery(
      "q10_distinct_parts_histogram",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_orderkey")
          .agg(countDistinct($"l_partkey").as("n_parts"))
          .groupBy($"n_parts")
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT n_parts, count(*) AS n_orders FROM (
        SELECT l_orderkey, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_orderkey) GROUP BY n_parts"""),
    ),

    // ------------------------------------------------------------------
    // q11: union of two sources + aggregation (set op).
    GraftQuery(
      "q11_union_account_balances",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
          .select(lit("customer").as("kind"), $"c_acctbal".as("bal"))
        val su = Tables.supplier(s, d)
          .select(lit("supplier").as("kind"), $"s_acctbal".as("bal"))
        c.unionByName(su)
          .groupBy($"kind")
          .agg(count(lit(1)).as("n"), D.intSum($"bal").as("total_bal"))
      },
      Some(s"""SELECT kind, count(*) AS n, ${D.sqlIntSum("bal")} AS total_bal
        FROM (SELECT 'customer' AS kind, c_acctbal AS bal FROM customer
          UNION ALL SELECT 'supplier', s_acctbal FROM supplier)
        GROUP BY kind"""),
    ),

    // ------------------------------------------------------------------
    // q12: conditional (pivot-style) aggregation.
    GraftQuery(
      "q12_conditional_pivot",
      (s, d) => {
        import s.implicits._
        def flagQty(flag: String) =
          (sum(when($"l_returnflag" === flag,
            round($"l_quantity" * 100).cast("long")).otherwise(0L)) / 100.0)
        Tables.lineitem(s, d)
          .groupBy($"l_linestatus")
          .agg(
            flagQty("R").as("qty_r"),
            flagQty("A").as("qty_a"),
            flagQty("N").as("qty_n"))
      },
      Some("""SELECT l_linestatus,
        sum(CASE WHEN l_returnflag='R' THEN CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END)/100.0 AS qty_r,
        sum(CASE WHEN l_returnflag='A' THEN CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END)/100.0 AS qty_a,
        sum(CASE WHEN l_returnflag='N' THEN CAST(round(l_quantity*100) AS BIGINT) ELSE 0 END)/100.0 AS qty_n
        FROM lineitem GROUP BY l_linestatus"""),
    ),

    // ------------------------------------------------------------------
    // q13: string-function battery over part (projection only, no shuffle).
    GraftQuery(
      "q13_string_functions",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(
            $"p_partkey",
            upper($"p_brand").as("brand_upper"),
            lower($"p_type").as("type_lower"),
            length($"p_name").as("name_len"),
            substring($"p_type", 1, 5).as("type_prefix"),
            concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
            regexp_replace($"p_name", "[aeiou]", "").as("name_novowel"),
            trim($"p_name").as("name_trim"))
      },
      Some("""SELECT p_partkey, upper(p_brand) AS brand_upper,
        lower(p_type) AS type_lower, length(p_name) AS name_len,
        substring(p_type, 1, 5) AS type_prefix,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        trim(p_name) AS name_trim FROM part"""),
    ),

    // ------------------------------------------------------------------
    // q14: HAVING — brands whose average retail price clears a bar.
    GraftQuery(
      "q14_having_brands",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_parts"), D.intAvg($"p_retailprice").as("avg_price"))
          .filter($"avg_price" > 900.0)
      },
      Some(s"""SELECT p_brand, count(*) AS n_parts,
        ${D.sqlIntAvg("p_retailprice")} AS avg_price
        FROM part GROUP BY p_brand
        HAVING ${D.sqlIntAvg("p_retailprice")} > 900.0"""),
    ),

    // ------------------------------------------------------------------
    // q15: CUBE (full grouping-set lattice).
    GraftQuery(
      "q15_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), D.intSum($"o_totalprice").as("total"))
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        ${D.sqlIntSum("o_totalprice")} AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""),
    ),

    // ------------------------------------------------------------------
    // q16: exact percentiles (sorted interpolation — engine-identical on
    // identical input doubles).
    GraftQuery(
      "q16_percentiles",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
            min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
      },
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_extendedprice, 0.9) AS p90_price,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag"""),
    ),

    // ------------------------------------------------------------------
    // q17: salted skew join — row-identical to the plain join (the oracle
    // IS the plain join), only the shuffle layout differs.
    GraftQuery(
      "q17_salted_skew_join",
      (s, d) => {
        import s.implicits._
        val fact = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey", $"l_quantity")
        val dim = Tables.part(s, d).select($"p_partkey".as("l_partkey"), $"p_brand")
        graft.ops.Skew.saltedJoin(fact, dim, "l_partkey", factor = 8)
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n"), D.intSum($"l_quantity").as("qty"))
      },
      Some(s"""SELECT p_brand, count(*) AS n, ${D.sqlIntSum("l_quantity")} AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand"""),
    ),

    // ------------------------------------------------------------------
    // q18: range (interval) join — overlapping 36-hour windows derived from
    // order keys, laid over the events month; events match MULTIPLE windows
    // (a genuine interval join, broadcast + between-predicate in Spark,
    // same inequality join in DuckDB).
    GraftQuery(
      "q18_range_join",
      (s, d) => {
        import s.implicits._
        val windows = Tables.orders(s, d)
          .select(($"o_orderkey" % 28).cast("int").as("wd"),
            ($"o_custkey" % 24).cast("int").as("wh"))
          .distinct()
          .select($"wd", $"wh",
            expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, wd, wh, 0, 0)").as("w_start"),
            expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, wd, wh + 36, 0, 0)").as("w_end"))
        val ev = Tables.events(s, d).select($"event_id", $"ts", $"value")
        ev.join(broadcast(windows), $"ts" >= $"w_start" && $"ts" < $"w_end")
          .groupBy($"wd", $"wh")
          .agg(count(lit(1)).as("n_events"), D.intSum($"value").as("total_value"))
      },
      Some(s"""WITH w AS (
          SELECT wd, wh,
            TIMESTAMP '2024-01-01 00:00:00' + to_days(wd) + to_hours(wh) AS w_start,
            TIMESTAMP '2024-01-01 00:00:00' + to_days(wd) + to_hours(wh + 36) AS w_end
          FROM (SELECT DISTINCT CAST(o_orderkey % 28 AS INT) AS wd,
            CAST(o_custkey % 24 AS INT) AS wh FROM orders))
        SELECT wd, wh, count(*) AS n_events, ${D.sqlIntSum("value")} AS total_value
        FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY wd, wh"""),
    ),

    // ------------------------------------------------------------------
    // q19: correlated scalar subquery (decorrelates to join + agg) — parts
    // priced above their brand's average.
    GraftQuery(
      "q19_above_brand_avg",
      (s, d) => {
        import s.implicits._
        val p = Tables.part(s, d)
        val brandAvg = p.groupBy($"p_brand".as("b"))
          .agg(D.intAvg($"p_retailprice").as("brand_avg"))
        p.join(broadcast(brandAvg), $"p_brand" === $"b")
          .filter($"p_retailprice" > $"brand_avg")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_above"), D.intAvg($"p_retailprice").as("avg_above"))
      },
      Some(s"""SELECT p_brand, count(*) AS n_above,
        ${D.sqlIntAvg("p_retailprice")} AS avg_above
        FROM part p WHERE p_retailprice > (
          SELECT ${D.sqlIntAvg("p2.p_retailprice")} FROM part p2
          WHERE p2.p_brand = p.p_brand)
        GROUP BY p_brand"""),
    ),

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
