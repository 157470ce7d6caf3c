package graft.queries

import graft.core.{GraftQuery, Tables}
import graft.ops.{Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators (sim01-sim09): brute-force cosine top-k,
  * IVF cells, int8 quantization, MMR re-rank, PQ/ADC, RRF fusion, IVFPQ
  * — broadcast query sides, cell/band equi-joins, shortlist re-rank;
  * each with an exact DuckDB oracle (double-cast sequential accumulation
  * verified bit-identical across engines). Split out of ExtQueries in
  * round 9 (registry hygiene); queries and oracles are byte-identical to
  * their pre-split forms.
  */
object SimQueries {

  /** embeddings come float32; all oracle math runs on double (see
    * ExtQueries — same helper, duplicated to keep the split free of
    * cross-file private leakage) */
  private def embDouble(c: Column): Column = Similarity.toDouble(c)

  /** PQ encode SQL CTEs (sub/cb/enc/rec over a CTE `e(id, v)`) — the
    * DuckDB mirror of [[Similarity.pqReconstruct]], shared by sim07 and
    * sim09; a codebook-scheme change edits exactly that pair. The reduced
    * L2 key (`c·c − 2·s·c`, per-vector constant s·s dropped) is mirrored
    * TEXTUALLY so both engines order by the same float values.
    */
  private[queries] def pqSqlCtes: String =
    """sub AS (SELECT id, m, list_slice(v, m*8 + 1, m*8 + 8) AS sv
          FROM e, UNNEST(range(8)) AS g(m)),
        cb AS (SELECT m, CAST(id AS INT) AS code, sv AS cv FROM sub WHERE id < 16),
        enc AS (SELECT id, m, code FROM (
            SELECT s.id, s.m, c.code,
              row_number() OVER (PARTITION BY s.id, s.m ORDER BY
                list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv),
                c.code) AS rn
            FROM sub s JOIN cb c ON s.m = c.m) WHERE rn = 1),
        rec AS (SELECT n.id, flatten(list(c.cv ORDER BY n.m)) AS rvec
          FROM enc n JOIN cb c ON n.m = c.m AND n.code = c.code GROUP BY n.id)"""

  val all: Seq[GraftQuery] = Seq(

    // ------------------------------------------------------------------
    // brute-force cosine top-5 for the first 20 vectors (exact baseline).
    GraftQuery(
      "sim01_topk_bruteforce",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        Similarity.bruteForceTopK(e.filter(col("id") < 20), e, 5)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT q_id, n_id, cos, rnk FROM (
          SELECT a.id AS q_id, b.id AS n_id,
            list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos,
            row_number() OVER (PARTITION BY a.id
              ORDER BY list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) DESC, b.id ASC) AS rnk
          FROM e a JOIN e b ON a.id < 20 AND b.id <> a.id)
        WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // IVF-style: assign every vector to nearest of 16 seed centroids
    // (vec_id 0-15), search top-3 within the query's cell only.
    GraftQuery(
      "sim02_ivf_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        val cells = Similarity.assignCells(e, e.filter(col("id") < 16))
        val q = cells.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("cell_id"), col("vec").as("q_vec"))
        val cand = cells.select(col("id").as("n_id"), col("cell_id"), col("vec").as("n_vec"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        broadcast(q).join(cand, Seq("cell_id"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("cell_id"), col("n_id"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT id AS cell_id, v AS cv FROM e WHERE id < 16),
        assign AS (
          SELECT id, cell_id, v FROM (
            SELECT e.id, s.cell_id, e.v,
              row_number() OVER (PARTITION BY e.id ORDER BY
                list_dot_product(e.v, s.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS rn
            FROM e CROSS JOIN seeds s) WHERE rn = 1),
        scored AS (
          SELECT q.id AS q_id, q.cell_id, c.id AS n_id,
            list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
          FROM assign q JOIN assign c ON q.cell_id = c.cell_id AND q.id < 20 AND c.id <> q.id)
        SELECT q_id, cell_id, n_id, cos, rnk FROM (
          SELECT q_id, cell_id, n_id, cos,
            row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk
          FROM scored) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // int8-quantized similarity: symmetric per-vector quantization, exact
    // integer dot products (bit-identical cross-engine — the compression
    // layer of a large vector index), top-3 by quantized cosine.
    GraftQuery(
      "sim03_int8_quant",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"),
            Similarity.quantizeInt8(embDouble(col("embedding"))).as("qv"))
          .withColumn("qn", Similarity.normInt8(col("qv")))
          .transform(graft.core.Caches.persist)
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("qv").as("q_qv"), col("qn").as("q_qn"))
        val c = e.select(col("id").as("n_id"), col("qv").as("n_qv"), col("qn").as("n_qn"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("n_id").asc)
        broadcast(q).crossJoin(c)
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosineInt8(col("q_qv"), col("n_qv"), col("q_qn"), col("n_qn")).as("qcos"))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        m AS (SELECT id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
        q AS (SELECT id, CASE WHEN ma = 0 THEN list_transform(v, x -> 0::BIGINT)
              ELSE list_transform(v, x -> CAST(round(x * 127.0 / ma) AS BIGINT)) END AS qv FROM m),
        n AS (SELECT id, qv, sqrt(list_dot_product(qv, qv)) AS qn FROM q)
        SELECT q_id, n_id, qcos, rnk FROM (
          SELECT a.id AS q_id, b.id AS n_id,
            list_dot_product(a.qv, b.qv) / (a.qn * b.qn) AS qcos,
            row_number() OVER (PARTITION BY a.id
              ORDER BY list_dot_product(a.qv, b.qv) / (a.qn * b.qn) DESC, b.id ASC) AS rnk
          FROM n a JOIN n b ON a.id < 20 AND b.id <> a.id)
        WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // MMR diversified re-rank (Carbonell & Goldstein '98, λ=0.5): take each
    // query's top-10 relevance candidates, then pick 3 greedily, each pick
    // penalized by its max similarity to the already-picked set. The greedy
    // loop UNROLLS to three window passes over the candidate frames — the
    // per-query candidate set is k (constant), so the pairwise-similarity
    // join is k² per query, independent of corpus size; the corpus itself
    // is touched only by the sim01-style broadcast relevance scan. Scores
    // quantize to integer micro-cosines, ties break on n_id — argmaxes are
    // exact cross-engine.
    GraftQuery(
      "sim05_mmr_rerank",
      (s, d) => {
        val micro = (c: org.apache.spark.sql.Column) =>
          round(c * 1000000.0).cast("long")
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .withColumn("nn", Similarity.norm(col("vec")))
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"), col("nn").as("q_n"))
        val cW = Window.partitionBy(col("q_id"))
          .orderBy(col("rel_micro").desc, col("n_id").asc)
        val cand = broadcast(q).crossJoin(
            e.select(col("id").as("n_id"), col("vec").as("n_vec"), col("nn").as("n_n")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("n_vec"), col("n_n"),
            micro(Similarity.dot(col("q_vec"), col("n_vec")) /
              (col("q_n") * col("n_n"))).as("rel_micro"))
          .withColumn("rn", row_number().over(cW)).filter(col("rn") <= 10)
          .transform(graft.core.Caches.persist)
        val pairs = cand.as("a").join(cand.as("b"),
            col("a.q_id") === col("b.q_id") && col("a.n_id") =!= col("b.n_id"))
          .select(col("a.q_id").as("q_id"), col("a.n_id").as("i"), col("b.n_id").as("j"),
            micro(Similarity.dot(col("a.n_vec"), col("b.n_vec")) /
              (col("a.n_n") * col("b.n_n"))).as("sim_micro"))
          .transform(graft.core.Caches.persist)
        // Round 18 (VERDICT r17 item 9, guide §3.1): every frame in the
        // greedy-pick unroll is candidate-list-sized (≤ 20 queries × 10
        // candidates; pairs ≤ 20 × 10 × 9) but derives from windows over
        // persisted caches, so the planner's size estimates never clear the
        // auto-broadcast threshold and each join was a 32-partition
        // sort-merge (two exchanges each). Explicit broadcast hints on the
        // picked-set (p1/p2) and pairs sides turn all six joins into
        // BroadcastHashJoins — same join keys, same rows, no shuffles.
        val slim = cand.select(col("q_id"), col("n_id"), col("rel_micro"), col("rn"))
        val p1 = slim.filter(col("rn") === 1)
          .select(col("q_id"), col("n_id").as("c1"), col("rel_micro").as("rel1"))
        val w2 = Window.partitionBy(col("q_id")).orderBy(col("score2").desc, col("n_id").asc)
        val p2 = slim.join(broadcast(p1), "q_id").filter(col("n_id") =!= col("c1"))
          .join(broadcast(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c1"),
            col("sim_micro"))), Seq("q_id", "n_id", "c1"))
          .withColumn("score2", col("rel_micro") - col("sim_micro"))
          .withColumn("rn2", row_number().over(w2)).filter(col("rn2") === 1)
          .select(col("q_id"), col("n_id").as("c2"), col("rel_micro").as("rel2"))
        val w3 = Window.partitionBy(col("q_id")).orderBy(col("score3").desc, col("n_id").asc)
        val p3 = slim.join(broadcast(p1), "q_id").join(broadcast(p2), "q_id")
          .filter(col("n_id") =!= col("c1") && col("n_id") =!= col("c2"))
          .join(broadcast(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c1"),
            col("sim_micro").as("sim1"))), Seq("q_id", "n_id", "c1"))
          .join(broadcast(pairs.select(col("q_id"), col("i").as("n_id"), col("j").as("c2"),
            col("sim_micro").as("sim2"))), Seq("q_id", "n_id", "c2"))
          .withColumn("score3", col("rel_micro") - greatest(col("sim1"), col("sim2")))
          .withColumn("rn3", row_number().over(w3)).filter(col("rn3") === 1)
          .select(col("q_id"), col("n_id").as("c3"), col("rel_micro").as("rel3"))
        p1.select(col("q_id"), lit(1L).as("pick"), col("c1").as("n_id"),
            col("rel1").as("rel_micro"))
          .unionAll(p2.select(col("q_id"), lit(2L).as("pick"), col("c2").as("n_id"),
            col("rel2").as("rel_micro")))
          .unionAll(p3.select(col("q_id"), lit(3L).as("pick"), col("c3").as("n_id"),
            col("rel3").as("rel_micro")))
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT id, v, sqrt(list_dot_product(v,v)) AS nn FROM e),
        scored AS (SELECT a.id AS q_id, b.id AS n_id, b.v AS bv, b.nn AS bn,
            CAST(round(list_dot_product(a.v,b.v)/(a.nn*b.nn)*1000000.0) AS BIGINT) AS rel_micro
          FROM n a JOIN n b ON a.id < 20 AND b.id <> a.id),
        cand AS (SELECT * FROM (SELECT q_id, n_id, bv, bn, rel_micro,
            row_number() OVER (PARTITION BY q_id ORDER BY rel_micro DESC, n_id) AS rn FROM scored)
          WHERE rn <= 10),
        pairs AS (SELECT a.q_id, a.n_id AS i, b.n_id AS j,
            CAST(round(list_dot_product(a.bv,b.bv)/(a.bn*b.bn)*1000000.0) AS BIGINT) AS sim_micro
          FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
        p1 AS (SELECT q_id, n_id AS c1, rel_micro AS rel1 FROM cand WHERE rn = 1),
        s2 AS (SELECT c.q_id, c.n_id, c.rel_micro,
            row_number() OVER (PARTITION BY c.q_id
              ORDER BY c.rel_micro - p.sim_micro DESC, c.n_id) AS rn2
          FROM cand c JOIN p1 ON p1.q_id = c.q_id
            JOIN pairs p ON p.q_id = c.q_id AND p.i = c.n_id AND p.j = p1.c1
          WHERE c.n_id <> p1.c1),
        p2 AS (SELECT q_id, n_id AS c2, rel_micro AS rel2 FROM s2 WHERE rn2 = 1),
        s3 AS (SELECT c.q_id, c.n_id, c.rel_micro,
            row_number() OVER (PARTITION BY c.q_id
              ORDER BY c.rel_micro - greatest(pa.sim_micro, pb.sim_micro) DESC, c.n_id) AS rn3
          FROM cand c JOIN p1 ON p1.q_id = c.q_id JOIN p2 ON p2.q_id = c.q_id
            JOIN pairs pa ON pa.q_id = c.q_id AND pa.i = c.n_id AND pa.j = p1.c1
            JOIN pairs pb ON pb.q_id = c.q_id AND pb.i = c.n_id AND pb.j = p2.c2
          WHERE c.n_id <> p1.c1 AND c.n_id <> p2.c2),
        p3 AS (SELECT q_id, n_id AS c3, rel_micro AS rel3 FROM s3 WHERE rn3 = 1)
        SELECT q_id, CAST(1 AS BIGINT) AS pick, c1 AS n_id, rel1 AS rel_micro FROM p1
        UNION ALL SELECT q_id, 2, c2, rel2 FROM p2
        UNION ALL SELECT q_id, 3, c3, rel3 FROM p3"""),
    ),

    // ------------------------------------------------------------------
    // Hybrid-retrieval fusion (RRF, k=60): the vector leg is exact-cosine
    // top-10 (sim01's broadcast-query scan) and the lexical leg is
    // token-set-Jaccard top-10 over the SAME id space (embeddings and
    // documents share ids by construction); candidates fuse by reciprocal
    // rank — score = Σ 1/(60+rank) over the lists a candidate appears in,
    // a ONE-addition float (fixed order in both engines) — and the fused
    // top-5 per query is reported with both leg ranks (NULL = candidate
    // missing from that leg). Scale: each leg broadcasts the 10-query
    // side and scans its corpus once; the fusion join and final windows
    // touch only top-10-sized lists. At 100 TB the legs would be the
    // library's index ops (sim02/sim04 for vectors, text10/text12 for
    // lexical) — RRF itself never changes shape: it is list-sized.
    GraftQuery(
      "sim08_rrf_fusion",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        val qv = e.filter(col("id") < 10)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
        val vw = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        val vec = broadcast(qv)
          .crossJoin(e.select(col("id").as("n_id"), col("vec").as("n_vec")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rank_vec", row_number().over(vw))
          .filter(col("rank_vec") <= 10)
          .select(col("q_id"), col("n_id"), col("rank_vec"))
        val t = Tables.documents(s, d)
          .select(col("doc_id").as("id"), array_distinct(TA.tokens(col("text"))).as("tk"))
        val qt = t.filter(col("id") < 10)
          .select(col("id").as("q_id"), col("tk").as("q_tk"))
        val inter = size(array_intersect(col("q_tk"), col("n_tk"))).cast("double")
        val jac = inter / (size(col("q_tk")) + size(col("n_tk")) -
          size(array_intersect(col("q_tk"), col("n_tk"))))
        val lw = Window.partitionBy(col("q_id")).orderBy(col("jac").desc, col("n_id").asc)
        val lex = broadcast(qt)
          .crossJoin(t.select(col("id").as("n_id"), col("tk").as("n_tk")))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), jac.as("jac"))
          .withColumn("rank_lex", row_number().over(lw))
          .filter(col("rank_lex") <= 10)
          .select(col("q_id"), col("n_id"), col("rank_lex"))
        val fused = vec.join(lex, Seq("q_id", "n_id"), "full")
          .withColumn("rrf",
            coalesce(lit(1.0) / (col("rank_vec") + 60), lit(0.0)) +
            coalesce(lit(1.0) / (col("rank_lex") + 60), lit(0.0)))
        val fw = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("n_id").asc)
        fused.withColumn("rnk", row_number().over(fw)).filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("rank_vec"), col("rank_lex"),
            col("rrf"), col("rnk"))
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        a AS (SELECT q_id, n_id, rank_vec FROM (
            SELECT q.id AS q_id, c.id AS n_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) DESC, c.id) AS rank_vec
            FROM e q CROSS JOIN e c WHERE q.id < 10 AND c.id <> q.id)
          WHERE rank_vec <= 10),
        t AS (SELECT doc_id AS id,
            list_distinct(regexp_split_to_array(trim(text), '\s+')) AS tk
          FROM documents),
        b AS (SELECT q_id, n_id, rank_lex FROM (
            SELECT q.id AS q_id, c.id AS n_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                CAST(len(list_intersect(q.tk, c.tk)) AS DOUBLE)
                  / (len(q.tk) + len(c.tk) - len(list_intersect(q.tk, c.tk)))
                  DESC, c.id) AS rank_lex
            FROM t q CROSS JOIN t c WHERE q.id < 10 AND c.id <> q.id)
          WHERE rank_lex <= 10),
        f AS (SELECT coalesce(a.q_id, b.q_id) AS q_id,
            coalesce(a.n_id, b.n_id) AS n_id, a.rank_vec, b.rank_lex,
            coalesce(1.0 / (a.rank_vec + 60), 0.0)
              + coalesce(1.0 / (b.rank_lex + 60), 0.0) AS rrf
          FROM a FULL JOIN b ON a.q_id = b.q_id AND a.n_id = b.n_id)
      SELECT q_id, n_id, rank_vec, rank_lex, rrf, rnk FROM (
        SELECT q_id, n_id, rank_vec, rank_lex, rrf,
          row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, n_id) AS rnk
        FROM f) WHERE rnk <= 5"""),
    ),

    // ------------------------------------------------------------------
    // Product quantization (IVF-PQ's compression tier): the 64-dim space
    // splits into 8 subspaces of 8 dims; each subspace's codebook is the
    // sub-slices of the first 16 corpus vectors (deterministic seeds, the
    // sim02 convention); every vector encodes to 8 one-byte codes = 32×
    // smaller than float64 storage. Queries score asymmetrically (ADC):
    // exact query vs reconstructed corpus — numerically IDENTICAL to the
    // LUT formulation, since ADC is by definition the distance to the
    // reconstruction — shortlist top-8 by ADC, then exact-cosine re-rank
    // to top-3. Scale: the codebook (8·16 rows) broadcasts; encode is a
    // broadcast join + one map-side-combinable min_by per (vector,
    // subspace) — the corpus never shuffles on anything but its own id;
    // ADC is the sim01 broadcast-query scan shape. At 100 TB only codes
    // ride the serving path (32× less I/O); the reconstruction here makes
    // the oracle exact without a separate LUT operator.
    GraftQuery(
      "sim07_pq_adc",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .transform(graft.core.Caches.persist)
        // pqReconstruct is column-preserving since round 17 — the exact
        // vector rides along, so the old rec⋈e re-attach join (two small
        // exchanges AQE collapsed to one task) is gone
        val corpus = Similarity.pqReconstruct(e, subspaces = 8, subDim = 8, seeds = 16)
          .select(col("id").as("n_id"), col("rvec"), col("vec").as("n_vec"))
        val q = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
        val adc = Similarity.dot(col("q_vec"), col("q_vec")) +
          Similarity.dot(col("rvec"), col("rvec")) -
          lit(2.0) * Similarity.dot(col("q_vec"), col("rvec"))
        val sw = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id").asc)
        val short = broadcast(q).crossJoin(corpus)
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), adc.as("adc"), col("q_vec"), col("n_vec"))
          .withColumn("srn", row_number().over(sw)).filter(col("srn") <= 8)
        val rw = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
        short.select(col("q_id"), col("n_id"), col("adc"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(rw)).filter(col("rnk") <= 3)
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        $pqSqlCtes,
        corpus AS (SELECT e.id AS n_id, r.rvec, e.v AS n_vec
          FROM rec r JOIN e ON e.id = r.id),
        adc AS (SELECT q.id AS q_id, c.n_id,
            list_dot_product(q.v, q.v) + list_dot_product(c.rvec, c.rvec)
              - 2*list_dot_product(q.v, c.rvec) AS adc,
            q.v AS q_vec, c.n_vec
          FROM e q CROSS JOIN corpus c WHERE q.id < 20 AND q.id <> c.n_id),
        short AS (SELECT q_id, n_id, adc, q_vec, n_vec FROM (
            SELECT q_id, n_id, adc, q_vec, n_vec,
              row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS srn
            FROM adc) WHERE srn <= 8)
      SELECT q_id, n_id, adc, cos, rnk FROM (
        SELECT q_id, n_id, adc,
          list_dot_product(q_vec, n_vec) / (sqrt(list_dot_product(q_vec, q_vec))
            * sqrt(list_dot_product(n_vec, n_vec))) AS cos,
          row_number() OVER (PARTITION BY q_id ORDER BY
            list_dot_product(q_vec, n_vec) / (sqrt(list_dot_product(q_vec, q_vec))
              * sqrt(list_dot_product(n_vec, n_vec))) DESC, n_id) AS rnk
        FROM short) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // sim09: IVF+PQ — the composed billion-scale ANN architecture (the
    // IVFADC design of Jégou et al., "Product Quantization for Nearest
    // Neighbor Search", TPAMI 2011, as deployed in FAISS): sim02's coarse
    // quantizer routes each query to its nprobe=2 nearest cells, sim07's
    // product quantizer compresses every corpus vector to 8 one-byte codes,
    // and the query scores ONLY the probed cells' posting lists by ADC
    // before an exact-cosine re-rank of the shortlist. (PQ here encodes raw
    // vectors, not residuals — the IVF-Flat-PQ variant — so the codebook
    // stage is shared verbatim with sim07 and the oracle stays exact.)
    // Scale: centroids (fixed at 16 deterministic seeds here, the sim02
    // convention; k≈√N is the production-scale sizing) and the 8·16-row
    // codebook broadcast;
    // cell assignment and encode are broadcast joins + one map-side-
    // combinable min_by each; candidate generation is an EQUI-JOIN on
    // cell_id (the corpus is never cross-joined against the query set —
    // each query touches ~nprobe/k of the postings); ADC reads only the
    // 8-byte codes (32× less I/O than float64 vectors at 100 TB); exact
    // vectors re-attach by keyed join for the top-8 shortlist only.
    GraftQuery(
      "sim09_ivfpq",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .transform(graft.core.Caches.persist)
        // coarse quantizer + PQ reconstruct, both column-preserving in-row
        // projections since round 17: the inverted list fuses into ONE
        // shuffle-free stage instead of an n_id join of two aggregates
        val posting = Similarity.pqReconstruct(
            Similarity.assignCells(e, e.filter(col("id") < 16)),
            subspaces = 8, subDim = 8, seeds = 16)
          .select(col("id").as("n_id"), col("cell_id"), col("rvec"))
        // query routing: nprobe=2 best cells by centroid cosine
        val seeds = e.filter(col("id") < 16)
          .select(col("id").as("cell_id"), col("vec").as("cell_vec"))
        val cw = Window.partitionBy(col("q_id"))
          .orderBy(col("c_cos").desc, col("cell_id").asc)
        val routed = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
          .crossJoin(broadcast(seeds))
          .select(col("q_id"), col("q_vec"), col("cell_id"),
            Similarity.cosine(col("q_vec"), col("cell_vec")).as("c_cos"))
          .withColumn("crn", row_number().over(cw)).filter(col("crn") <= 2)
          .select(col("q_id"), col("q_vec"), col("cell_id"))
        // ADC over probed cells only — equi-join, never a corpus cross join
        val adc = Similarity.dot(col("q_vec"), col("q_vec")) +
          Similarity.dot(col("rvec"), col("rvec")) -
          lit(2.0) * Similarity.dot(col("q_vec"), col("rvec"))
        val sw = Window.partitionBy(col("q_id"))
          .orderBy(col("adc").asc, col("n_id").asc)
        val short = broadcast(routed).join(posting, Seq("cell_id"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("q_vec"), adc.as("adc"))
          .withColumn("srn", row_number().over(sw)).filter(col("srn") <= 8)
        // exact re-rank: true vectors re-attach by keyed join (top-8 only)
        val rw = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)
        broadcast(short)
          .join(e.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
          .select(col("q_id"), col("n_id"), col("adc"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(rw)).filter(col("rnk") <= 3)
      },
      Some(s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT id AS cell_id, v AS cv FROM e WHERE id < 16),
        assign AS (SELECT id, cell_id FROM (
            SELECT e.id, s.cell_id,
              row_number() OVER (PARTITION BY e.id ORDER BY
                list_dot_product(e.v, s.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS rn
            FROM e CROSS JOIN seeds s) WHERE rn = 1),
        $pqSqlCtes,
        posting AS (SELECT a.id AS n_id, a.cell_id, r.rvec
          FROM assign a JOIN rec r ON r.id = a.id),
        routed AS (SELECT q_id, q_vec, cell_id FROM (
            SELECT q.id AS q_id, q.v AS q_vec, s.cell_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                list_dot_product(q.v, s.cv) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS crn
            FROM e q CROSS JOIN seeds s WHERE q.id < 20) WHERE crn <= 2),
        short AS (SELECT q_id, n_id, adc, q_vec FROM (
            SELECT r.q_id, p.n_id, r.q_vec,
              list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                - 2*list_dot_product(r.q_vec, p.rvec) AS adc,
              row_number() OVER (PARTITION BY r.q_id ORDER BY
                list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                  - 2*list_dot_product(r.q_vec, p.rvec) ASC, p.n_id ASC) AS srn
            FROM routed r JOIN posting p
              ON r.cell_id = p.cell_id AND r.q_id <> p.n_id) WHERE srn <= 8)
      SELECT q_id, n_id, adc, cos, rnk FROM (
        SELECT s.q_id, s.n_id, s.adc,
          list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) AS cos,
          row_number() OVER (PARTITION BY s.q_id ORDER BY
            list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) DESC,
            s.n_id ASC) AS rnk
        FROM short s JOIN e ON e.id = s.n_id) WHERE rnk <= 3"""),
    ),

    // ------------------------------------------------------------------
    // Hard-negative mining for retrieval/embedding training (the batch
    // that matters for contrastive fine-tuning): for each query vector,
    // the top-5 most-similar DIFFERENT-label vectors (the hard negatives)
    // plus the best same-label similarity (pos_cos), and an in_margin
    // flag marking negatives inside the 0.1 contrastive margin — exactly
    // the rows a triplet/InfoNCE sampler would emit. Query side (20 rows)
    // broadcasts; the corpus is scanned once per leg with map-side
    // partial max for the positive leg; per-query top-5 runs on the
    // 20×N joined slice, never the corpus alone. Same bit-identical
    // sequential-fold cosine as sim01.
    GraftQuery(
      "sim10_hard_negatives",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"),
            col("label"))
        val q = e.filter(col("id") < 20).select(col("id").as("q_id"),
          col("vec").as("q_vec"), Similarity.norm(col("vec")).as("q_n"),
          col("label").as("q_label"))
        val c = e.select(col("id").as("n_id"), col("vec").as("n_vec"),
          Similarity.norm(col("vec")).as("n_n"), col("label").as("n_label"))
        val scored = broadcast(q).crossJoin(c)
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
            (Similarity.dot(col("q_vec"), col("n_vec")) /
              (col("q_n") * col("n_n"))).as("cos"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)
        val neg = scored.filter(col("n_label") =!= col("q_label"))
          .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
        val pos = scored.filter(col("n_label") === col("q_label"))
          .groupBy(col("q_id")).agg(max(col("cos")).as("pos_cos"))
        neg.join(pos, "q_id")
          .select(col("q_id"), col("n_id"), col("cos"), col("rnk"),
            col("pos_cos"),
            (col("cos") > col("pos_cos") - lit(0.1)).cast("int").as("in_margin"))
      },
      Some {
        val cos = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label FROM embeddings),
          neg AS (SELECT q_id, n_id, cos, rnk FROM (
              SELECT a.id AS q_id, b.id AS n_id, $cos AS cos,
                row_number() OVER (PARTITION BY a.id
                  ORDER BY $cos DESC, b.id ASC) AS rnk
              FROM e a JOIN e b ON a.id < 20 AND b.id <> a.id
                AND b.label <> a.label)
            WHERE rnk <= 5),
          pos AS (SELECT a.id AS q_id, max($cos) AS pos_cos
            FROM e a JOIN e b ON a.id < 20 AND b.id <> a.id
              AND b.label = a.label
            GROUP BY 1)
        SELECT n.q_id, n.n_id, n.cos, n.rnk, p.pos_cos,
          CAST(n.cos > p.pos_cos - CAST(0.1 AS DOUBLE) AS INT) AS in_margin
        FROM neg n JOIN pos p USING (q_id)"""
      },
    ),

    // ------------------------------------------------------------------
    // EXACT cosine range search with metric cell pruning (round 12): all
    // (query, neighbor) pairs with cos ≥ τ — the radius query behind
    // DBSCAN-style corpus clustering and near-dup sweeps, where top-k is
    // the wrong primitive. Soundness, not heuristics: on unit vectors
    // the plain R^d triangle inequality gives d(q,v) ≥ d(q,c) − r_c for
    // any member v of the cell with centroid c and radius r_c =
    // max_v d(c,v), so a cell is skipped ONLY when even its nearest
    // possible member fails τ (with 1e-9 float slack) — the survivors
    // get the exact cosine check, so the result is IDENTICAL to brute
    // force and the oracle IS brute force (the pruning never needs a SQL
    // mirror). Scale shape: seeds+radii broadcast (|cells| rows), the
    // corpus partitions by cell_id once, per-query work is
    // |admissible cells| not |corpus|; worst case (τ→−1) degrades to
    // the brute-force cross join, the documented contract.
    GraftQuery(
      "sim11_range_search",
      (s, d) => {
        val tau = 0.15
        val eps = 1e-9
        val dmax = math.sqrt(2.0 - 2.0 * tau) + eps
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
        val seeds = e.filter(col("id") < 16)
          .select(col("id").as("cell_id"), col("vec").as("cvec"))
        val cells = Similarity.assignCells(e, e.filter(col("id") < 16))
        // unit-sphere distance to the cell centroid: sqrt(2 - 2cos)
        def sphereDist(a: Column, b: Column): Column =
          sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * Similarity.cosine(a, b)))
        val members = cells.join(broadcast(seeds), Seq("cell_id"))
          .select(col("cell_id"), col("id").as("n_id"), col("vec").as("n_vec"),
            // norm precomputed ONCE per vector (sim01's shape): sqrt is
            // deterministic per value, so dot/(qn*nn) is bit-identical
            // to the oracle's per-pair expression
            Similarity.norm(col("vec")).as("nn"),
            sphereDist(col("vec"), col("cvec")).as("dcv"))
        val radii = members.groupBy(col("cell_id")).agg(max(col("dcv")).as("r"))
        // query side bounded (id < 500 ∧ id % 5 = 0 → ≤100 queries at ANY
        // corpus scale — the sim01 convention): a range query's OUTPUT is
        // inherently |queries|·density·N, so an unbounded query side would
        // make the operator quadratic no matter how good the pruning
        val q = e.filter(col("id") % 5 === 0 && col("id") < 500)
          .select(col("id").as("q_id"), col("vec").as("q_vec"),
            Similarity.norm(col("vec")).as("qn"))
        val probe = q
          .crossJoin(broadcast(seeds.join(radii, Seq("cell_id"))))
          .filter(sphereDist(col("q_vec"), col("cvec")) - col("r") <= lit(dmax))
          .select(col("q_id"), col("q_vec"), col("qn"), col("cell_id"))
        broadcast(probe)
          .join(members.select(col("cell_id"), col("n_id"), col("n_vec"), col("nn")),
            Seq("cell_id"))
          .select(col("q_id"), col("n_id"),
            (Similarity.dot(col("q_vec"), col("n_vec")) / (col("qn") * col("nn")))
              .as("cos"))
          .filter(col("q_id") =!= col("n_id") && col("cos") >= lit(tau))
      },
      Some("""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.id AS q_id, b.id AS n_id,
          list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) AS cos
        FROM e a JOIN e b ON a.id % 5 = 0 AND a.id < 500 AND b.id <> a.id
        WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) >= CAST(0.15 AS DOUBLE)"""),
    ),

    // ------------------------------------------------------------------
    // Vector-index build → SHIP → serve, end to end (round 12): sim09's
    // IVF-PQ index (cell assignments + PQ-reconstructed vectors) is
    // SERIALIZED into Arrow IPC shard streams (list<f64> keeps the
    // reconstruction bit-exact), reloaded through the pyarrow-pinned
    // reader, and only THEN queried — the real lifecycle where a builder
    // job persists the index and a serving job loads it. The oracle is
    // sim09's verbatim: the shipped index must answer IDENTICALLY to the
    // never-serialized one, so one wrong byte through flatbuffer
    // metadata, offsets, or f64 buffers flips a neighbor. Scale shape:
    // postings shard by cell group (per-shard map, no extra shuffle);
    // everything after is sim09's broadcast-routed equi-join plan.
    GraftQuery(
      "pipe05_index_ship",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
          .transform(graft.core.Par.spread)
          .select(col("vec_id").as("id"), embDouble(col("embedding")).as("vec"))
          .transform(graft.core.Caches.persist)
        // fused shuffle-free posting build (the sim09 round-17 shape)
        val posting = Similarity.pqReconstruct(
            Similarity.assignCells(e, e.filter(col("id") < 16)),
            subspaces = 8, subDim = 8, seeds = 16)
          .select(col("id").as("n_id"), col("cell_id"), col("rvec"))
        // ship: postings → Arrow IPC shards → reload. Shard key is
        // `n_id DIV rowsPerShard` (TarQueries' `doc_id DIV 8` pattern):
        // per-shard row count is CAPPED at rowsPerShard regardless of
        // corpus size while the shard COUNT grows with the data, so the
        // collect_list state per task stays bounded at 100 TB (the
        // round-12 `cell_id % 4` grouping buffered N/4 rows per task).
        // Shards mix cells freely — the serve side re-joins on cell_id,
        // so the ship grouping is semantically invisible.
        val rowsPerShard = 2048L
        val shipped = posting
          .groupBy(expr(s"n_id DIV $rowsPerShard").as("g"))
          .agg(collect_list(struct(col("cell_id").as("_1"),
            col("n_id").as("_2"), col("rvec").as("_3"))).as("recs"))
          .as[(Long, Seq[(Long, Long, Seq[Double])])]
          .flatMap { case (_, recs) =>
            import graft.ops.ArrowIpc._
            val fields = Vector(
              AField("cell_id", "i64", nullable = false),
              AField("n_id", "i64", nullable = false),
              AField("rvec", "list<f64>", nullable = false))
            val bytes = graft.ops.ArrowIpc.write(fields, Seq(Vector[ACol](
              ALongCol("cell_id", null, recs.map(_._1).toArray),
              ALongCol("n_id", null, recs.map(_._2).toArray),
              ADoubleListCol("rvec", null, recs.map(_._3.toArray).toArray))))
            graft.ops.ArrowIpc.read(bytes).iterator.flatMap { b =>
              val cid = b.cols(0).asInstanceOf[ALongCol].v
              val nid = b.cols(1).asInstanceOf[ALongCol].v
              val rv = b.cols(2).asInstanceOf[ADoubleListCol].v
              (0 until b.nRows).iterator.map(i => (cid(i), nid(i), rv(i).toSeq))
            }
          }
          .toDF("cell_id", "n_id", "rvec")
        // serve: sim09's query path over the RELOADED index
        val seeds = e.filter(col("id") < 16)
          .select(col("id").as("cell_id"), col("vec").as("cell_vec"))
        val cw = Window.partitionBy(col("q_id"))
          .orderBy(col("c_cos").desc, col("cell_id").asc)
        val routed = e.filter(col("id") < 20)
          .select(col("id").as("q_id"), col("vec").as("q_vec"))
          .crossJoin(broadcast(seeds))
          .select(col("q_id"), col("q_vec"), col("cell_id"),
            Similarity.cosine(col("q_vec"), col("cell_vec")).as("c_cos"))
          .withColumn("crn", row_number().over(cw)).filter(col("crn") <= 2)
          .select(col("q_id"), col("q_vec"), col("cell_id"))
        val adc = Similarity.dot(col("q_vec"), col("q_vec")) +
          Similarity.dot(col("rvec"), col("rvec")) -
          lit(2.0) * Similarity.dot(col("q_vec"), col("rvec"))
        val sw = Window.partitionBy(col("q_id"))
          .orderBy(col("adc").asc, col("n_id").asc)
        val short = broadcast(routed).join(shipped, Seq("cell_id"))
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"), col("q_vec"), adc.as("adc"))
          .withColumn("srn", row_number().over(sw)).filter(col("srn") <= 8)
        val rw = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id").asc)
        broadcast(short)
          .join(e.select(col("id").as("n_id"), col("vec").as("n_vec")), Seq("n_id"))
          .select(col("q_id"), col("n_id"), col("adc"),
            Similarity.cosine(col("q_vec"), col("n_vec")).as("cos"))
          .withColumn("rnk", row_number().over(rw)).filter(col("rnk") <= 3)
      },
      // the shipped index must answer exactly like the live one: sim09's
      // oracle, verbatim
      Some(s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        seeds AS (SELECT id AS cell_id, v AS cv FROM e WHERE id < 16),
        assign AS (SELECT id, cell_id FROM (
            SELECT e.id, s.cell_id,
              row_number() OVER (PARTITION BY e.id ORDER BY
                list_dot_product(e.v, s.cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS rn
            FROM e CROSS JOIN seeds s) WHERE rn = 1),
        $pqSqlCtes,
        posting AS (SELECT a.id AS n_id, a.cell_id, r.rvec
          FROM assign a JOIN rec r ON r.id = a.id),
        routed AS (SELECT q_id, q_vec, cell_id FROM (
            SELECT q.id AS q_id, q.v AS q_vec, s.cell_id,
              row_number() OVER (PARTITION BY q.id ORDER BY
                list_dot_product(q.v, s.cv) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(s.cv, s.cv))) DESC,
                s.cell_id ASC) AS crn
            FROM e q CROSS JOIN seeds s WHERE q.id < 20) WHERE crn <= 2),
        short AS (SELECT q_id, n_id, adc, q_vec FROM (
            SELECT r.q_id, p.n_id, r.q_vec,
              list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                - 2*list_dot_product(r.q_vec, p.rvec) AS adc,
              row_number() OVER (PARTITION BY r.q_id ORDER BY
                list_dot_product(r.q_vec, r.q_vec) + list_dot_product(p.rvec, p.rvec)
                  - 2*list_dot_product(r.q_vec, p.rvec) ASC, p.n_id ASC) AS srn
            FROM routed r JOIN posting p
              ON r.cell_id = p.cell_id AND r.q_id <> p.n_id) WHERE srn <= 8)
      SELECT q_id, n_id, adc, cos, rnk FROM (
        SELECT s.q_id, s.n_id, s.adc,
          list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) AS cos,
          row_number() OVER (PARTITION BY s.q_id ORDER BY
            list_dot_product(s.q_vec, e.v) / (sqrt(list_dot_product(s.q_vec, s.q_vec)) * sqrt(list_dot_product(e.v, e.v))) DESC,
            s.n_id ASC) AS rnk
        FROM short s JOIN e ON e.id = s.n_id) WHERE rnk <= 3"""),
    ),
  )
}
