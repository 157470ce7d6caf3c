package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Clustering, Dedup, Similarity, Sketches, TextAnalysis => TA}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus SAMPLING + sketch operators: weighted/k-center corpus sampling
  * (samp03/samp07) and two more mergeable sketches (AMS F2 moment, KMV
  * set operations). Siblings from the round-10/13 file-size splits (query
  * bodies byte-identical across splits): QC/drift in [[QcQueries]],
  * mixtures/clustering in [[MixtureQueries]], decontamination/curation in
  * [[DeconQueries]], packing/preference data in [[PackingQueries]]. All
  * beyond the reference's scope, sized for the 100 TB training-data
  * target, and — like the rest of the suite — exactly reproduced by a
  * DuckDB oracle (md5-derived hashes, integer arithmetic, single-ordered
  * float divisions).
  */
object CorpusQueries {

  import Sketches.hashSlice

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // Weighted bottom-k corpus sampling: language-weighted priority sampling
    // with EXACT integer keys. Classic weighted reservoirs order by
    // u^(1/w) — floating-point and engine-divergent. Instead the key is
    // (h % 2^57) · (8 / w) with weights w ∈ {1,2,4,8}: minimizing h/w is
    // the same ordering, every key is an exact 61-bit integer, and the
    // winner set is bit-identical in any engine. ORDER BY key LIMIT k plans
    // as per-partition top-k + merge (TakeOrdered — O(k) memory, no global
    // sort), the only sane way to draw a weighted sample from 100 TB.
    GraftQuery(
      "samp03_weighted",
      (s, d) => {
        val wMul = expr("""CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4
          WHEN 'es' THEN 2 WHEN 'zh' THEN 1 ELSE 4 END""")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            ((TA.hash60(concat(lit("wsamp:"), col("doc_id").cast("string")))
              % lit(1L << 57)) * wMul).as("key"))
          .orderBy(col("key"), col("doc_id"))
          .limit(100)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"))
      },
      Some {
        val h = TA.Sql.hash60("concat('wsamp:', CAST(doc_id AS VARCHAR))")
        s"""WITH k AS (SELECT doc_id, lang FROM (
            SELECT doc_id, lang, ($h % ${1L << 57}) *
              (CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4
                 WHEN 'es' THEN 2 WHEN 'zh' THEN 1 ELSE 4 END) AS key
            FROM documents) ORDER BY key, doc_id LIMIT 100)
        SELECT lang, count(*) AS n_sampled FROM k GROUP BY lang"""
      },
    ),

    // ------------------------------------------------------------------
    // AMS F2 moment sketch (self-join size / skew estimator): five ±1 sign
    // estimators from bits 0..4 of one md5-derived word per key, each
    // estimate = (Σ sign·count)², report the median against the exact
    // Σ count². The whole sketch is ONE map-side-combinable aggregation
    // producing 6 numbers — the way you measure key skew (the q17 salting
    // trigger) on 100 TB without materializing the frequency table. All
    // sums are exact integers; the median is the middle element of five.
    GraftQuery(
      "sketch07_ams_f2",
      (s, d) => {
        val keyed = Tables.lineitem(s, d)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
          .withColumn("hw", hashSlice(
            md5(concat(lit("f2:"), col("l_partkey").cast("string"))), 0))
        val signs = (0 until 5).map { j =>
          sum(when(shiftright(col("hw"), j).bitwiseAND(lit(1L)) === 1L,
            col("cnt")).otherwise(-col("cnt"))).as(s"s$j")
        }
        keyed.agg(signs.head, signs.tail :+ sum(col("cnt") * col("cnt")).as("exact_f2"): _*)
          .select(
            sort_array(array((0 until 5).map(j =>
              (col(s"s$j") * col(s"s$j")).cast("long")): _*)).getItem(2).as("est_f2"),
            col("exact_f2"))
      },
      Some {
        val hw = "CAST(concat('0x', substring(md5(concat('f2:', CAST(l_partkey AS VARCHAR))), 1, 8)) AS BIGINT)"
        s"""WITH keyed AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
          b AS (SELECT cnt, $hw AS hw FROM keyed),
          est AS (SELECT j, CAST(sum(CASE WHEN (hw >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS BIGINT) AS sj
            FROM b, UNNEST(generate_series(0, 4)) AS u(j) GROUP BY j)
        SELECT (SELECT list(sj * sj ORDER BY sj * sj)[3] FROM est) AS est_f2,
          (SELECT CAST(sum(cnt * cnt) AS BIGINT) FROM keyed) AS exact_f2"""
      },
    ),

    // ------------------------------------------------------------------
    // KMV set operations: union and intersection cardinality estimates
    // across two segments (orders shipping before vs after 1998-07-01) from
    // their bottom-256 sketches ONLY — the sketches merge (union = bottom-k
    // of the combined set; intersection = Jaccard over the merged bottom-k
    // × est_union), so segment sketches computed once answer cross-segment
    // overlap questions without rescanning either side. Exact counts
    // alongside; the estimator divisions are single-ordered.
    GraftQuery(
      "sketch08_kmv_setops",
      (s, d) => {
        val k = 256
        val split = lit("1998-07-01").cast("date")
        def bottomK(df: org.apache.spark.sql.DataFrame) = df
          .select(TA.hash60(concat(lit("su:"), col("k").cast("string"))).as("h"))
          .distinct().orderBy(col("h")).limit(k)
        val li = Tables.lineitem(s, d)
        // each segment feeds BOTH its bottom-k sketch and the exact joint
        // count — persist the distinct key sets so lineitem scans once per
        // segment, not twice (4 corpus scans -> 2)
        val a = li.filter(col("l_shipdate") < split).select(col("l_orderkey").as("k"))
          .distinct().transform(graft.core.Caches.persist)
        val b = li.filter(col("l_shipdate") >= split).select(col("l_orderkey").as("k"))
          .distinct().transform(graft.core.Caches.persist)
        val ka = bottomK(a).transform(graft.core.Caches.persist)
        val kb = bottomK(b).transform(graft.core.Caches.persist)
        val un = ka.union(kb).distinct().orderBy(col("h")).limit(k).transform(graft.core.Caches.persist)
        val stats = un.agg(count(lit(1)).as("kk"), max(col("h")).as("kth"))
          .withColumn("est_union", Sketches.kmvEstimate(col("kk"), col("kth")))
        val shared = un.join(ka, Seq("h"), "left_semi").join(kb, Seq("h"), "left_semi")
          .agg(count(lit(1)).as("n_shared"))
        val exacts = a.withColumn("in_a", lit(1))
          .join(b.withColumn("in_b", lit(1)), Seq("k"), "full")
          .agg(count(lit(1)).as("exact_union"),
            count(when(col("in_a").isNotNull && col("in_b").isNotNull, lit(1))).as("exact_inter"))
        stats.crossJoin(shared).crossJoin(exacts)
          .select(col("est_union"),
            round(col("n_shared").cast("double") / col("kk") * col("est_union"))
              .cast("long").as("est_inter"),
            col("exact_union"), col("exact_inter"))
      },
      Some {
        val h = TA.Sql.hash60("concat('su:', CAST(k AS VARCHAR))")
        s"""WITH a AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_shipdate < DATE '1998-07-01'),
          b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_shipdate >= DATE '1998-07-01'),
          ka AS (SELECT $h AS h FROM a ORDER BY 1 LIMIT 256),
          kb AS (SELECT $h AS h FROM b ORDER BY 1 LIMIT 256),
          un AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 256),
          stats AS (SELECT count(*) AS kk, max(h) AS kth,
              ${Sketches.sqlKmvEstimate("count(*)", "max(h)")} AS est_union FROM un),
          shared AS (SELECT count(*) AS n_shared FROM un
            WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb))
        SELECT est_union,
          CAST(round(CAST(n_shared AS DOUBLE) / kk * est_union) AS BIGINT) AS est_inter,
          (SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM b)) AS exact_union,
          (SELECT count(*) FROM a WHERE k IN (SELECT k FROM b)) AS exact_inter
        FROM stats, shared"""
      },
    ),

    // ------------------------------------------------------------------
    // Greedy k-center coreset (Gonzalez's 2-approximation, the classic
    // diversity-selection scheme for training-data subset curation):
    // seed with the lowest vec_id, then k-1 rounds of "pick the vector
    // FARTHEST from every selected center" (squared L2, argmax with
    // min-vec_id tie-break), finishing with a nearest-center assignment
    // whose per-center counts are the coreset cell weights. Scale: each
    // round is ONE corpus scan against k centroid LITERALS (the kmeans
    // shape — no join, no shuffle; the per-round driver collect is one
    // row) plus a top-1 sort that AQE reduces to a per-partition top-1 +
    // k-row merge; the assignment pass is the same literal scan with a
    // map-side-combinable count. Cross-engine determinism mirrors clust01
    // exactly: distances compare as ((v.v + c.c) - 2*(v.c)) with the
    // SAME association and sequential dot-product folds in both engines,
    // so argmax rows, assignment, and micro-quantized pick distances are
    // bit-identical under the DuckDB oracle.
    GraftQuery(
      "samp07_kcenter",
      (s, d) => {
        import s.implicits._
        val k = 4
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
          .transform(graft.core.Caches.persist)
        val seed = e.orderBy(col("vec_id")).limit(1).collect()(0)
        var cents = Seq(0 -> seed.getAs[scala.collection.Seq[Double]]("v").toArray)
        var picks = Vector((0, seed.getAs[Long]("vec_id"), 0L))
        for (r <- 1 until k) {
          val nxt = e
            .select(col("vec_id"), col("v"),
              Clustering.minDist(col("v"), cents).as("dd"))
            .orderBy(col("dd").desc, col("vec_id").asc).limit(1).collect()(0)
          cents = cents :+ (r -> nxt.getAs[scala.collection.Seq[Double]]("v").toArray)
          picks = picks :+ ((r, nxt.getAs[Long]("vec_id"),
            math.round(nxt.getAs[Double]("dd") * 1e6)))
        }
        val weights = e.withColumn("cid", Clustering.assign(col("v"), cents))
          .groupBy(col("cid")).agg(count(lit(1)).as("n_assigned"))
        picks.toDF("pick", "center_id", "d_micro")
          .join(weights, col("pick") === col("cid"), "left")
          .select(col("pick"), col("center_id"), col("d_micro"),
            coalesce(col("n_assigned"), lit(0L)).as("n_assigned"))
      },
      Some {
        def dist(a: String, b: String) =
          s"list_dot_product($a, $a) + list_dot_product($b, $b)" +
            s" - 2*list_dot_product($a, $b)"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
          d1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "c.v")} AS d FROM e, c0 c),
          p1 AS (SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
          d2 AS (SELECT x.vec_id, x.v, least(x.d, ${dist("x.v", "c.v")}) AS d
            FROM d1 x, p1 c),
          p2 AS (SELECT vec_id, v, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
          d3 AS (SELECT x.vec_id, x.v, least(x.d, ${dist("x.v", "c.v")}) AS d
            FROM d2 x, p2 c),
          p3 AS (SELECT vec_id, v, d FROM d3 ORDER BY d DESC, vec_id LIMIT 1),
          picks AS (
            SELECT 0 AS pick, vec_id, v, 0.0 AS d FROM c0
            UNION ALL SELECT 1, vec_id, v, d FROM p1
            UNION ALL SELECT 2, vec_id, v, d FROM p2
            UNION ALL SELECT 3, vec_id, v, d FROM p3),
          asg AS (SELECT vec_id, pick FROM (
              SELECT e.vec_id, p.pick,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY ${dist("e.v", "p.v")} ASC, p.pick ASC) AS rn
              FROM e CROSS JOIN picks p) WHERE rn = 1),
          na AS (SELECT pick, count(*) AS n_assigned FROM asg GROUP BY 1)
        SELECT p.pick, p.vec_id AS center_id,
          CAST(round(p.d * 1000000.0) AS BIGINT) AS d_micro,
          coalesce(n_assigned, 0) AS n_assigned
        FROM picks p LEFT JOIN na USING (pick)"""
      },
    ),

  )
}
