package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Clustering, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MIXTURE planning and clustering operators (temperature/epoch/
  * water-filling/annealed mixture plans, Lloyd k-means + inertia, the
  * SemDeDup embedding dedup that shares their k-means CTE), split out of
  * QcQueries in round 13 (registry hygiene; query bodies byte-identical).
  */
object MixtureQueries {

  /** clust01/dedup09 clustering shape — ONE definition for the Spark call
    * sites and the oracle CTE below, so k/dim cannot silently diverge.
    */
  private val KmeansK = 8
  private val KmeansDim = 64

  /** The clust01 2-round Lloyd CTE block (see [[graft.ops.Clustering]]),
    * ending in `s2(vec_id, v, cid)` — the final assignment WITH the vector,
    * so downstream oracles (clust01's counts, dedup09's within-cluster
    * pairs) share one bit-identical clustering.
    */
  private def sqlKmeans2Ctes: String = {
    val Q = Clustering.Quant
    def distRank(cents: String) =
      s"""SELECT vec_id, v, cid,
        list_dot_product(v,v) + list_dot_product(c,c) - 2*list_dot_product(v,c) AS dst,
        row_number() OVER (PARTITION BY vec_id
        ORDER BY list_dot_product(v,v) + list_dot_product(c,c) - 2*list_dot_product(v,c), cid) AS rn
      FROM e CROSS JOIN $cents"""
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS c FROM e WHERE vec_id < $KmeansK),
      a1 AS (${distRank("c0")}),
      s1 AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
      u1 AS (SELECT cid, d, CAST(sum(CAST(round(v[d+1]*$Q) AS BIGINT)) AS BIGINT) AS sq,
          count(*) AS n
        FROM s1, UNNEST(generate_series(0, ${KmeansDim - 1})) AS g(d) GROUP BY cid, d),
      c1 AS (SELECT cid, list((sq / $Q) / n ORDER BY d) AS c FROM u1 GROUP BY cid),
      a2 AS (${distRank("c1")}),
      s2 AS (SELECT vec_id, v, cid, dst FROM a2 WHERE rn = 1)"""
  }

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Lloyd k-means over the embeddings (k=8, 2 rounds, first-k init) —
    // the IVF coarse-quantizer trainer behind sim02's cell structure. Each
    // round is a PROJECTION against centroid literals (k·dim doubles —
    // driver-sized at any corpus scale; no join, no shuffle to assign) plus
    // one map-side-combinable groupBy into k·dim cells to update. Distances
    // compare as ((v·v + c·c) − 2·(v·c)) with identical association in both
    // engines; centroid updates are quantized-integer means — so the final
    // assignment is bit-identical under the DuckDB oracle (see
    // [[graft.ops.Clustering]]).
    GraftQuery(
      "clust01_kmeans",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
          .transform(graft.core.Caches.persist)
        Clustering.kmeans(e, k = KmeansK, dim = KmeansDim, iters = 2)
          .groupBy(col("cid").as("cluster"))
          .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
      },
      Some {
        s"""WITH $sqlKmeans2Ctes
        SELECT cid AS cluster, count(*) AS n_vecs, min(vec_id) AS first_vec
        FROM s2 GROUP BY cid"""
      },
    ),

    // ------------------------------------------------------------------
    // SemDeDup-style semantic dedup (Abbas et al. 2023): k-means first,
    // then cosine pairs WITHIN each cluster only; of every near-duplicate
    // pair, the higher vec_id is dropped. The clustering is what makes
    // semantic dedup feasible at 100 TB: pair comparison is cluster-local
    // (cid is the shuffle key), and k grows with the corpus so per-cluster
    // pair counts stay bounded — never a global all-pairs. A cluster that
    // goes hot anyway degrades to SRP star edges (see
    // [[graft.ops.Clustering.semanticDrops]]; clusters here are ≤ ~700 rows
    // at every test SF, so the uncapped plan — which the oracle mirrors —
    // is what runs). Norms are precomputed once per vector; the clustering
    // itself is the bit-identical clust01 trainer, so the DuckDB oracle
    // reproduces the exact assignment and the exact drop set.
    GraftQuery(
      "dedup09_semdedup",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
          .transform(graft.core.Caches.persist)
        val assigned = Clustering.kmeans(e, k = KmeansK, dim = KmeansDim, iters = 2)
          .withColumn("n", Similarity.norm(col("v")))
          .transform(graft.core.Caches.persist) // norm once per vector, not per pair
        val dropped = Clustering
          .semanticDrops(assigned, dim = KmeansDim, minCos = 0.35, threshold = 4096)
          .withColumn("dup", lit(1))
        assigned.join(dropped, Seq("cid", "vec_id"), "left")
          .groupBy(col("cid").as("cluster"))
          .agg(count(lit(1)).as("n_vecs"), count(col("dup")).as("n_dropped"),
            (count(lit(1)) - count(col("dup"))).as("n_kept"))
      },
      Some {
        s"""WITH $sqlKmeans2Ctes,
          nrm AS (SELECT vec_id, cid, v, sqrt(list_dot_product(v, v)) AS n FROM s2),
          dropped AS (SELECT DISTINCT b.cid, b.vec_id FROM nrm a JOIN nrm b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v) / (a.n * b.n) >= 0.35)
        SELECT s2.cid AS cluster, count(*) AS n_vecs,
          count(d.vec_id) AS n_dropped,
          count(*) - count(d.vec_id) AS n_kept
        FROM s2 LEFT JOIN dropped d ON s2.cid = d.cid AND s2.vec_id = d.vec_id
        GROUP BY s2.cid"""
      },
    ),

    // ------------------------------------------------------------------
    // Temperature-based mixture weights (the UnifiedQA / Pile recipe,
    // alpha = 0.5): per (lang, source) the char mass n_i is raised to
    // n_i^alpha and renormalized, flattening the head so low-resource
    // sources are up-sampled. The corpus-scale stage is ONE map-side-
    // combinable groupBy; the weight table is mixture-sized (#groups) and
    // the grand total joins back as a broadcast scalar. Determinism:
    // sqrt is IEEE-exact on integer inputs in both engines, micro-scaled
    // to BIGINT before the sum, and each weight is a single double
    // division of two BIGINTs rounded once — no float accumulation.
    GraftQuery(
      "mix01_temperature",
      (s, d) => {
        // Round 18 (the mix03 shape, VERDICT r17 item 8): the grand total is
        // a GLOBAL WINDOW sum over the mixture-sized group table instead of
        // agg → broadcast → crossJoin, which re-ran the corpus groupBy for
        // the scalar — one corpus scan, one linear pipeline, identical exact
        // BIGINT arithmetic.
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
          .withColumn("s_micro", round(sqrt(col("chars")) * 1000000.0).cast("long"))
          .withColumn("total", expr("sum(s_micro) OVER ()"))
          .select(
            col("lang"), col("source"), col("n_docs"), col("chars"), col("s_micro"),
            round(col("s_micro") * 1000000.0 / col("total")).cast("long").as("weight_ppm"),
            round(col("s_micro") * 100000.0 / col("total")).cast("long").as("take"))
      },
      Some("""WITH c AS (SELECT lang, source, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS chars
          FROM documents GROUP BY 1, 2),
        s AS (SELECT lang, source, n_docs, chars,
            CAST(round(sqrt(chars) * 1000000.0) AS BIGINT) AS s_micro FROM c),
        t AS (SELECT CAST(sum(s_micro) AS BIGINT) AS total FROM s)
        SELECT lang, source, n_docs, chars, s_micro,
          CAST(round(s_micro * 1000000.0 / total) AS BIGINT) AS weight_ppm,
          CAST(round(s_micro * 100000.0 / total) AS BIGINT) AS take
        FROM s, t"""),
    ),

    // ------------------------------------------------------------------
    // Mixture quota planning (mix01's weights turned into an executable
    // plan): a 10M-token budget is allocated across (lang, source) groups
    // proportionally to the temperature weights using LARGEST-REMAINDER
    // rounding, so the integer quotas sum EXACTLY to the budget — floor
    // division loses < 1 token per group, and the leftover goes to the
    // groups with the largest remainders (ties broken lexicographically).
    // epochs_ppm = quota/available shows which groups must oversample
    // (> 1e6 ppm = more than one pass). All arithmetic is exact BIGINT
    // except the final ppm, one rounded division; the ranking window runs
    // on the mixture-sized table, never the corpus. Budget stays at 1e7 so
    // B * s_micro (~5e16) cannot overflow 64 bits at any test SF.
    GraftQuery(
      "mix02_epoch_plan",
      (s, d) => {
        // Round 18 (the mix03 shape, VERDICT r17 item 8): total and leftover
        // are GLOBAL WINDOW sums over the mixture-sized table instead of two
        // agg → broadcast → crossJoin rounds that each re-ran the corpus
        // groupBy — one corpus scan, one single-partition pipeline, the same
        // exact BIGINT largest-remainder arithmetic.
        val B = 10000000L
        Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(sum(col("n_chars")).as("chars"))
          .withColumn("s_micro", round(sqrt(col("chars")) * 1000000.0).cast("long"))
          .withColumn("total", expr("sum(s_micro) OVER ()"))
          .withColumn("base", expr(s"($B * s_micro) div total"))
          .withColumn("rem", expr(s"($B * s_micro) % total"))
          .withColumn("leftover", lit(B) - expr("sum(base) OVER ()"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("lang"), col("source"))))
          .withColumn("quota",
            col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .select(col("lang"), col("source"), col("chars"), col("quota"),
            round(col("quota") * 1000000.0 / col("chars")).cast("long").as("epochs_ppm"),
            (col("quota") > col("chars")).cast("int").as("oversampled"))
      },
      Some("""WITH c AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY 1, 2),
          s AS (SELECT lang, source, chars,
              CAST(round(sqrt(chars) * 1000000.0) AS BIGINT) AS s_micro FROM c),
          t AS (SELECT CAST(sum(s_micro) AS BIGINT) AS total FROM s),
          j AS (SELECT lang, source, chars,
              (10000000 * s_micro) // total AS base,
              (10000000 * s_micro) % total AS rem
            FROM s, t),
          l AS (SELECT 10000000 - CAST(sum(base) AS BIGINT) AS leftover FROM j),
          r AS (SELECT j.*, leftover,
              row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
            FROM j, l)
        SELECT lang, source, chars,
          CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota,
          CAST(round((base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
            * 1000000.0 / chars) AS BIGINT) AS epochs_ppm,
          CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END > chars AS INT)
            AS oversampled
        FROM r"""),
    ),

    // ------------------------------------------------------------------
    // Water-filling mixture allocation (mix02 without oversampling): a
    // budget of half the corpus' total chars is allocated proportionally
    // to the temperature weights, but a group can never receive more than
    // it HAS (max one epoch). Each of 3 unrolled rounds allocates the
    // remaining budget over the still-unsaturated groups by the mix02
    // largest-remainder rule, clamps at availability, and returns the
    // surplus to the pool — the classic water-filling fixed point; any
    // residual after 3 rounds is reported as `unallocated` (deterministic
    // whether or not the mixture has converged). All arithmetic is exact
    // BIGINT (one IEEE sqrt per group, one rounded ppm division at the
    // end); every round's global sums are 1-row broadcasts and the
    // ranking windows run on the mixture-sized table, never the corpus.
    GraftQuery(
      "mix03_water_filling",
      (s, d) => {
        // Round 17: the rounds' scalar aggregates (pool, leftover, the
        // final residual) are GLOBAL WINDOW sums over the ≤ #groups-row
        // mixture table instead of agg → broadcast → crossJoin — the same
        // exact BIGINT arithmetic, but the whole 3-round fixed point is now
        // ONE single-partition pipeline (the table is mixture-sized by
        // construction) instead of ~12 scalar-aggregate jobs with
        // per-round persists (measured 3.6 s → ~0.5 s at sf0.1).
        val c = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(sum(col("n_chars")).as("chars"))
          .withColumn("sm", round(sqrt(col("chars")) * 1000000.0).cast("long"))
        val w0 = c
          .withColumn("B", expr("(sum(chars) OVER ()) div 2"))
          .withColumn("cum", lit(0L)).withColumn("sat", lit(false))

        def round1(w: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          w
            .withColumn("R", expr("max(B) OVER () - sum(cum) OVER ()"))
            .withColumn("T", expr(
              "coalesce(sum(CASE WHEN NOT sat THEN sm END) OVER (), CAST(0 AS BIGINT))"))
            .withColumn("base", when(col("sat") || col("T") === 0, lit(0L))
              .otherwise(expr("(R * sm) div T")))
            .withColumn("rem", when(col("sat") || col("T") === 0, lit(-1L))
              .otherwise(expr("(R * sm) % T")))
            .withColumn("lo", expr("max(R) OVER () - sum(base) OVER ()"))
            .withColumn("rk", row_number().over(
              Window.orderBy(col("rem").desc, col("lang"), col("source"))))
            .withColumn("want", col("cum") + col("base") +
              when(!col("sat") && col("T") > 0 && col("rk") <= col("lo"), 1L)
                .otherwise(0L))
            .select(col("lang"), col("source"), col("chars"), col("sm"), col("B"),
              least(col("want"), col("chars")).as("cum"),
              (col("sat") || col("want") >= col("chars")).as("sat"))

        round1(round1(round1(w0)))
          .withColumn("unallocated", expr("max(B) OVER () - sum(cum) OVER ()"))
          .select(
            col("lang"), col("source"), col("chars"), col("cum").as("quota"),
            col("sat").cast("int").as("saturated"),
            round(col("cum") * 1000000.0 / col("chars")).cast("long").as("fill_ppm"),
            col("unallocated"))
      },
      Some {
        def rnd(prev: String, n: Int): String = {
          val bonus = s"CASE WHEN NOT sat AND T > 0 AND rk <= lo THEN 1 ELSE 0 END"
          s"""st$n AS (SELECT max(B) - CAST(sum(cum) AS BIGINT) AS R,
              CAST(coalesce(sum(sm) FILTER (WHERE NOT sat), 0) AS BIGINT) AS T
            FROM $prev),
          j$n AS (SELECT p.*, st$n.R, st$n.T,
              CASE WHEN sat OR T = 0 THEN 0 ELSE (R * sm) // T END AS base,
              CASE WHEN sat OR T = 0 THEN -1 ELSE (R * sm) % T END AS rem
            FROM $prev p, st$n),
          l$n AS (SELECT max(R) - CAST(sum(base) AS BIGINT) AS lo FROM j$n),
          r$n AS (SELECT j$n.*, lo,
              row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
            FROM j$n, l$n),
          w$n AS (SELECT lang, source, chars, sm, B,
              least(cum + base + $bonus, chars) AS cum,
              sat OR cum + base + $bonus >= chars AS sat
            FROM r$n)"""
        }
        s"""WITH c AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
              FROM documents GROUP BY 1, 2),
          s AS (SELECT lang, source, chars,
              CAST(round(sqrt(chars) * 1000000.0) AS BIGINT) AS sm FROM c),
          b AS (SELECT CAST(sum(chars) AS BIGINT) // 2 AS B FROM s),
          w0 AS (SELECT lang, source, chars, sm, B,
              CAST(0 AS BIGINT) AS cum, FALSE AS sat FROM s, b),
          ${rnd("w0", 1)}, ${rnd("w1", 2)}, ${rnd("w2", 3)},
          un AS (SELECT max(B) - CAST(sum(cum) AS BIGINT) AS unallocated FROM w3)
        SELECT lang, source, chars, cum AS quota, CAST(sat AS INT) AS saturated,
          CAST(round(cum * 1000000.0 / chars) AS BIGINT) AS fill_ppm, unallocated
        FROM w3, un"""
      },
    ),

    // ------------------------------------------------------------------
    // Two-phase anneal schedule (the mid-training data-curriculum recipe:
    // a long temperature-weighted pretrain phase, then a short "anneal"
    // phase upweighting high-quality sources). Phase budgets split the
    // mix01 char budget 90/10 by integer div. Pretrain allocates by the
    // sqrt-temperature weights (mix01's sm); anneal allocates by
    // quality-boosted weights — groups in the top half by mean doc length
    // (rank over (chars div docs) desc with lang/source tie-break, the
    // deterministic quality proxy) count 3x their chars. Both phases use
    // mix02's largest-remainder rule, so each phase's quotas sum EXACTLY
    // to its budget. All arithmetic is exact BIGINT (one IEEE sqrt per
    // group); every global sum is a 1-row broadcast and the ranking
    // windows run on the <=97-row mixture table, never the corpus —
    // mix03's scale shape unchanged.
    GraftQuery(
      "mix04_anneal",
      (s, d) => {
        // Round 17 (the mix03 shape): every phase scalar (totals, budgets,
        // leftovers) is a GLOBAL WINDOW sum over the mixture-sized table —
        // identical exact-BIGINT arithmetic, one single-partition pipeline
        // instead of six scalar-aggregate broadcast jobs with persists.
        val qw = Window.orderBy(col("mlen").desc, col("lang"), col("source"))
        val w = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(sum(col("n_chars")).as("chars"), count(lit(1)).as("docs"))
          .withColumn("sm", round(sqrt(col("chars")) * 1000000.0).cast("long"))
          .withColumn("mlen", expr("chars div docs"))
          .withColumn("B", expr("(sum(chars) OVER ()) div 2"))
          .withColumn("ng", expr("count(1) OVER ()"))
          .withColumn("rkq", row_number().over(qw))
          .withColumn("boost", expr("CASE WHEN rkq <= (ng + 1) div 2 THEN 1 ELSE 0 END"))
          .withColumn("wa", col("chars") * when(col("boost") === 1, lit(3L)).otherwise(lit(1L)))
          .withColumn("b_pre", expr("(B * 9) div 10"))
          .withColumn("b_ann", expr("B - (B * 9) div 10"))
        // pretrain phase: largest-remainder over sm
        val qp = w
          .withColumn("basep", expr("(b_pre * sm) div (sum(sm) OVER ())"))
          .withColumn("remp", expr("(b_pre * sm) % (sum(sm) OVER ())"))
          .withColumn("lop", expr("max(b_pre) OVER () - sum(basep) OVER ()"))
          .withColumn("rkp", row_number().over(
            Window.orderBy(col("remp").desc, col("lang"), col("source"))))
          .withColumn("q_pre",
            col("basep") + when(col("rkp") <= col("lop"), 1L).otherwise(0L))
        // anneal phase: largest-remainder over the boosted weights
        qp
          .withColumn("basea", expr("(b_ann * wa) div (sum(wa) OVER ())"))
          .withColumn("rema", expr("(b_ann * wa) % (sum(wa) OVER ())"))
          .withColumn("loa", expr("max(b_ann) OVER () - sum(basea) OVER ()"))
          .withColumn("rka", row_number().over(
            Window.orderBy(col("rema").desc, col("lang"), col("source"))))
          .withColumn("q_ann",
            col("basea") + when(col("rka") <= col("loa"), 1L).otherwise(0L))
          .select(col("lang"), col("source"), col("chars"), col("boost"),
            col("q_pre"), col("q_ann"), (col("q_pre") + col("q_ann")).as("q_total"))
      },
      Some("""WITH c AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars,
              count(*) AS docs FROM documents GROUP BY 1, 2),
          s AS (SELECT lang, source, chars, docs,
              CAST(round(sqrt(chars) * 1000000.0) AS BIGINT) AS sm,
              chars // docs AS mlen FROM c),
          t AS (SELECT CAST(sum(chars) AS BIGINT) // 2 AS B, count(*) AS ng FROM s),
          q AS (SELECT s.*, t.B, t.ng,
              row_number() OVER (ORDER BY mlen DESC, lang, source) AS rkq FROM s, t),
          w AS (SELECT *,
              CASE WHEN rkq <= (ng + 1) // 2 THEN 1 ELSE 0 END AS boost,
              chars * CASE WHEN rkq <= (ng + 1) // 2 THEN 3 ELSE 1 END AS wa,
              (B * 9) // 10 AS b_pre, B - (B * 9) // 10 AS b_ann FROM q),
          tp AS (SELECT CAST(sum(sm) AS BIGINT) AS tpre FROM w),
          ap AS (SELECT w.*, (b_pre * sm) // tpre AS basep,
              (b_pre * sm) % tpre AS remp FROM w, tp),
          lp AS (SELECT max(b_pre) - CAST(sum(basep) AS BIGINT) AS lop FROM ap),
          qp AS (SELECT ap.*, lop,
              row_number() OVER (ORDER BY remp DESC, lang, source) AS rkp
            FROM ap, lp),
          pp AS (SELECT *, basep + CASE WHEN rkp <= lop THEN 1 ELSE 0 END AS q_pre
            FROM qp),
          ta AS (SELECT CAST(sum(wa) AS BIGINT) AS tann FROM w),
          aa AS (SELECT pp.*, (b_ann * wa) // tann AS basea,
              (b_ann * wa) % tann AS rema FROM pp, ta),
          la AS (SELECT max(b_ann) - CAST(sum(basea) AS BIGINT) AS loa FROM aa),
          ra AS (SELECT aa.*, loa,
              row_number() OVER (ORDER BY rema DESC, lang, source) AS rka
            FROM aa, la)
        SELECT lang, source, chars, boost,
          q_pre, basea + CASE WHEN rka <= loa THEN 1 ELSE 0 END AS q_ann,
          q_pre + basea + CASE WHEN rka <= loa THEN 1 ELSE 0 END AS q_total
        FROM ra"""),
    ),

    // ------------------------------------------------------------------
    // K-means model QC (inertia / worst-fit): per cluster, the exact sum
    // and max of squared distance to the FINAL centroids — the number an
    // IVF index build reads to decide whether k was large enough. Rides
    // the clust01 trainer (bit-identical iterations); the scoring pass is
    // one centroid-literal projection + one map-side-combinable groupBy,
    // with each distance micro-rounded to BIGINT before the sum (never a
    // float accumulation).
    GraftQuery(
      "clust02_inertia",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
          .transform(graft.core.Caches.persist)
        val (assigned, cents) = Clustering.kmeansWithCents(e, KmeansK, KmeansDim, iters = 2)
        assigned
          .withColumn("dst_micro",
            round(Clustering.minDist(col("v"), cents) * 1000000.0).cast("long"))
          .groupBy(col("cid").as("cluster"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("dst_micro")).as("inertia_micro"),
            max(col("dst_micro")).as("max_dist_micro"))
      },
      Some(s"""WITH $sqlKmeans2Ctes
        SELECT cid AS cluster, count(*) AS n_vecs,
          CAST(sum(CAST(round(dst * 1000000.0) AS BIGINT)) AS BIGINT) AS inertia_micro,
          max(CAST(round(dst * 1000000.0) AS BIGINT)) AS max_dist_micro
        FROM s2 GROUP BY cid"""),
    ),
  )
}
