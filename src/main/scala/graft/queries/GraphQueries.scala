package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** GRAPH operators over the co-purchase edge base (PageRank, triangle
  * counting, label propagation, association rules), split out of
  * PipelineQueries in round 13 (registry hygiene; query bodies
  * byte-identical).
  */
object GraphQueries {

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
      .transform(graft.core.Par.byKey(_, col("o")))
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

  val all: Seq[GraftQuery] = Seq(

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
        // Round 18: ONE e-scan via in-row explode (was unionAll = two cache
        // scans — identical endpoint multiset, identical counts)
        val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("dg"))
          .transform(graft.core.Caches.persist) // feeds BOTH orientation joins + totals
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
        val adj = ord
          .transform(graft.core.Par.byKey(_, col("s")))
          .groupBy(col("s")).agg(sort_array(collect_list(col("t"))).as("ts"))
        val ts = col("ts")
        val wedgePairs = flatten(transform(ts, (t1, i) =>
          transform(slice(ts, i + 2, greatest(size(ts) - i - 1, lit(0))),
            t2 => struct(t1.as("u"), t2.as("v")))))
        val wedge = adj.select(explode(wedgePairs).as("w"))
          .select(col("w.u").as("u"), col("w.v").as("v"))
        val tri = wedge.join(e, Seq("u", "v"), "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        // Round 18: n_edges rides the degree table — Σ dg = 2·|E| exactly
        // (every edge contributes one count at each endpoint), so one agg
        // over the tiny deg cache replaces a THIRD full e-scan, and both
        // scalars arrive in one crossJoin instead of two
        tri.crossJoin(deg.agg(
          expr("CAST(sum(dg) AS BIGINT) div 2").as("n_edges"),
          count(lit(1)).as("n_nodes")))
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
        // Round 18: ONE e-scan via in-row explode (was unionAll = two)
        val bi = e.select(explode(array(
            struct(col("u").as("n"), col("v").as("m")),
            struct(col("v").as("n"), col("u").as("m")))).as("x"))
          .select(col("x.n"), col("x.m"))
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
          .transform(graft.core.Par.byKey(_, col("ok")))
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
  )
}
