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

  )
}
