package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over embedding columns
  * (`Array[Float]`).
  *
  * Numeric discipline: floats cast to double BEFORE any arithmetic, dot
  * products accumulate sequentially (`aggregate`/`zip_with`) — verified
  * bit-identical to DuckDB's `list_dot_product(a::DOUBLE[], b::DOUBLE[])`,
  * so oracles compare exact doubles, no tolerance.
  *
  * Scale design: brute-force is the correctness baseline (O(Q·N) with Q
  * small: broadcast the query set, no shuffle of the corpus). The IVF
  * variant assigns each vector to its nearest seed centroid once (one
  * projection), then searches only same-cell candidates — the join is
  * equi-join on cell id, shuffle-partitioned, which is the standard
  * coarse-quantization layout at billion-vector scale.
  */
object Similarity {

  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Bind `v` — evaluated ONCE per row — as a lambda variable inside `body`.
    * A plain `withColumn` hoist does not survive the optimizer here:
    * CollapseProject re-inlines a single-use alias into the consuming
    * expression, and when that consumer is a higher-order-function lambda
    * the inlined tree re-evaluates PER ELEMENT. Routing the value through a
    * 1-element `transform` makes it a lambda variable, which nothing can
    * inline away (round 18, ADVICE r17: assignCells recomputed the row norm
    * per candidate).
    */
  private[ops] def bind1(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** dot of a double-array column against driver-side literals (broadcast
    * centroids etc.) — same sequential fold as [[dot]].
    */
  def dotLit(v: Column, w: Array[Double]): Column =
    aggregate(zip_with(v, array(w.map(lit(_)): _*), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** exact top-k neighbors for each query vector (brute force).
    * queries/corpus: (id, vec double[]) with disjoint roles; k small.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms are computed ONCE per row before the join (the per-pair work is
    // just the dot product); values are bit-identical to per-pair sqrt.
    val q = queries.select(col("id").as("q_id"), col("vec").as("q_vec"),
      norm(col("vec")).as("q_n"))
    val c = corpus.select(col("id").as("n_id"), col("vec").as("n_vec"),
      norm(col("vec")).as("n_n"))
    val joined = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_vec"), col("n_vec")) / (col("q_n") * col("n_n"))).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    joined.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** symmetric per-vector int8 quantization: q_i = round(127·x_i / max|x|).
    * int8 is the storage/wire format (8× smaller than float64 on disk); the
    * in-engine representation is LongType so the dot products are EXACT in
    * any engine (values ≤ 127²·dim ≪ 2⁵³), making quantized scores
    * bit-identical cross-engine — the compression layer of a billion-vector
    * index, with none of the float-accumulation nondeterminism.
    */
  def quantizeInt8(a: Column): Column = {
    val maxAbs = array_max(transform(a, x => abs(x)))
    when(maxAbs === 0.0, transform(a, _ => lit(0L)))
      .otherwise(transform(a, x => round(x * 127.0 / maxAbs).cast("long")))
  }

  /** exact integer dot product (long accumulation). */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** cosine over int8-quantized vectors (exact-integer dots → double). */
  def cosineInt8(a: Column, b: Column, na: Column, nb: Column): Column =
    dotLong(a, b).cast("double") / (na * nb)

  def normInt8(a: Column): Column = sqrt(dotLong(a, a).cast("double"))

  /** IVF cell id: index of the nearest seed centroid (deterministic seeds =
    * the first `nCells` vectors of the corpus, broadcast as literals-free
    * join). Ties break to the lowest cell id via the (−cos, id) struct min.
    */
  def assignCells(vectors: DataFrame, seeds: DataFrame): DataFrame = {
    // Round 17 (guide §2.4 — remove shuffles outright): the old plan fanned
    // the corpus out ×k against the broadcast seeds and folded it back with
    // a groupBy(id) min_by — one exchange whose tiny byte size made AQE
    // collapse the downstream stage to a single task. Instead the seed set
    // collapses to ONE broadcast row of (cell_id, centroid, norm) sorted by
    // cell_id, and the nearest-centroid pick is an in-row fold: the same
    // per-pair cosine arithmetic (sequential dot, norms computed once),
    // evaluated in ascending cell_id order with strict-improvement
    // replacement — exactly the (−cos, cell_id) struct-min, assuming no NaN
    // scores (zero/NaN-free vectors, the cross-engine parity precondition
    // the operator already carries). Column-preserving: output = input +
    // `cell_id`, so callers can fuse downstream stages shuffle-free.
    val cellRow = seeds
      .select(col("id").as("cell_id"), col("vec").as("cell_vec"),
        norm(col("vec")).as("cn"))
      .agg(sort_array(collect_list(
        struct(col("cell_id"), col("cell_vec"), col("cn")))).as("cbs"))
    // Round 18 (ADVICE r17): the round-17 fold evaluated score(c) TWICE per
    // candidate (when-condition + replacement struct) and recomputed the
    // row norm inside every evaluation. Now: the row norm binds once per
    // row (bind1), each candidate's cosine is computed exactly once inside
    // a transform, and the pick is array_max over (cos, −cell_id) structs —
    // max cos, ties to the LOWEST cell_id via the negated id, which is
    // exactly the old ascending-scan strict-improvement fold (and the
    // (−cos, cell_id) struct-min before it), assuming NaN-free scores (the
    // operator's standing cross-engine parity precondition). The per-pair
    // arithmetic is unchanged: same sequential dot, same single division by
    // (row_norm · centroid_norm) — bit-identical scores, identical pick.
    val best = bind1(norm(col("vec"))) { vn =>
      array_max(transform(col("cbs"), c => struct(
        (dot(col("vec"), c.getField("cell_vec")) / (vn * c.getField("cn")))
          .as("cos"),
        (-c.getField("cell_id")).as("nid"))))
    }
    vectors.crossJoin(broadcast(cellRow))
      .withColumn("cell_id", -best.getField("nid"))
      .drop("cbs")
  }

  /** Candidate (q_id, n_id) pairs from a banded-signature frame
    * (id, band, key) with a HOT-BUCKET CAP — the dedup02 contract applied
    * to the kNN-graph build. Buckets under `cap` rows pair all-vs-all
    * (and with no hot bucket the emitted plan is EXACTLY the plain
    * band-key self-join — zero cap overhead); a degenerate bucket (e.g. a
    * corpus of near-identical embeddings collapsing one band key) degrades
    * to symmetric STAR edges around the bucket-min hub — O(|bucket|)
    * instead of O(|bucket|²), the documented recall trade. The hot/cold
    * decision is one bucket-sized driver collect (≤ bands·2^bits rows at
    * ANY corpus scale, [[Dedup.hotKeys]] — collected once, re-broadcast as
    * a literal frame so the size aggregate never recomputes), never a
    * count-over-window on the corpus.
    */
  /** PQ encode → reconstruct, the compression stage shared by sim07
    * (PQ-ADC) and sim09 (IVF-PQ): split `(id, vec)` into `subspaces`
    * sub-vectors of `subDim` dims, take the sub-slices of the first
    * `seeds` vectors as each subspace's codebook (deterministic seeds,
    * the sim02 convention), assign every sub-vector its nearest code by
    * reduced L2 (`c·c − 2·s·c`, the per-vector constant s·s dropped —
    * identical argmin, mirrored textually in the SQL oracle), and add an
    * `rvec` column holding the concatenated codeword reconstruction.
    *
    * Scale shape: the codebook (subspaces·seeds entries) broadcasts as a
    * single sorted array row; encode+reconstruct is an in-row fold — the
    * corpus never shuffles at all. A codebook-scheme change edits exactly
    * here (+ [[graft.queries.ExtQueries.pqSqlCtes]], its SQL mirror).
    */
  def pqReconstruct(e: DataFrame, subspaces: Int, subDim: Int, seeds: Int): DataFrame = {
    // Round 17 (guide §2.4): the old plan exploded the corpus ×subspaces,
    // fanned it ×seeds against the broadcast codebook, and folded back with
    // TWO keyed aggregates — whose small exchanges AQE collapsed to
    // single-task stages that then carried all downstream ADC math. The
    // codebook is dimension-sized, so it now collapses to ONE broadcast row
    // of (m, code, cv) sorted by (m, code), and encode+reconstruct is an
    // in-row fold per subspace: the same reduced-L2 key (c·c − 2·s·c, same
    // slice expressions) scanned in ascending code order with strict-
    // improvement replacement — exactly the (dkey, code) min_by, assuming
    // NaN-free vectors (the operator's standing parity precondition).
    // Column-preserving: output = input + `rvec` — zero exchanges, so
    // callers fuse cell assignment, posting build and ADC in one stage.
    // Round 18 (ADVICE r17): the codebook row now carries each codeword's
    // self-dot `cc` = cv·cv — a candidate-constant the round-17 fold
    // re-derived per ROW per candidate (twice, in fact: dkey evaluated in
    // both the when-condition and the replacement struct). `cc` is the same
    // sequential-fold expression over the same cv, computed once at
    // codebook-build time — bit-identical doubles.
    val cbRow = e.filter(col("id") < seeds)
      .select(col("id").cast("int").as("code"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("vec"))
      .select(col("m"), col("code"),
        slice(col("vec"), col("m") * subDim + 1, lit(subDim)).as("cv"))
      .withColumn("cc", dot(col("cv"), col("cv")))
      .agg(sort_array(collect_list(
        struct(col("m"), col("code"), col("cv"), col("cc")))).as("cbs"))
    // per subspace: the query sub-slice binds once (bind1 — a withColumn
    // hoist would be CollapseProject-inlined back into the lambda), each
    // candidate's reduced-L2 key is computed exactly once, and array_min
    // over (dkey, code, cv) structs is the (dkey, code) min_by — codes are
    // unique within a subspace, so the cv field never participates in the
    // comparison; ties on dkey go to the lowest code, exactly the old
    // ascending-code strict-improvement fold. NaN-free precondition as
    // before. Same reduced-L2 key arithmetic: cc − 2·(sv·cv).
    val rvec = flatten(transform(sequence(lit(0), lit(subspaces - 1)), m =>
      bind1(slice(col("vec"), m * subDim + 1, lit(subDim))) { sv =>
        array_min(transform(filter(col("cbs"), c => c.getField("m") === m),
          c => struct(
            (c.getField("cc") - lit(2.0) * dot(sv, c.getField("cv")))
              .as("dkey"),
            c.getField("code").as("code"),
            c.getField("cv").as("cv"))))
          .getField("cv")
      }))
    e.crossJoin(broadcast(cbRow))
      .withColumn("rvec", rvec)
      .drop("cbs")
  }

  def bandedPairsCapped(banded: DataFrame, cap: Int): DataFrame = {
    // Round 18 A/B, REJECTED: pinning the band-key self-join at a
    // data-derived width (the Dedup.allPairs treatment) removed a 315 ms
    // single-task stage from sim06's profile but measured +0.5 s in four
    // independent full-suite runs — unlike the blocked-jaccard joins, the
    // work downstream of THIS join is id-only pair emission + distinct
    // (the cosine math runs after the re-attach joins, which carry their
    // own exchanges), so AQE's byte-proportional coalescing is the right
    // call here at every scale. Left unpinned.
    def allPairs(src: DataFrame): DataFrame =
      src.select(col("id").as("q_id"), col("band"), col("key"))
        .join(src.select(col("id").as("n_id"), col("band"), col("key")),
          Seq("band", "key"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"))

    Dedup.hotKeys(banded, Seq("band", "key"), cap) match {
      case None => allPairs(banded).distinct()
      case Some(hot) =>
        val cold = banded.join(hot, Seq("band", "key"), "left_anti")
        val hotB = banded.join(hot, Seq("band", "key"), "left_semi")
        val star = hotB
          .withColumn("hub", min(col("id")).over(
            Window.partitionBy(col("band"), col("key"))))
          .filter(col("id") =!= col("hub"))
          .select(col("hub").as("q_id"), col("id").as("n_id"))
        // kNN graph candidates are directional: emit both orientations so
        // every bucket member still collects neighbors
        val sym = star.unionByName(
          star.select(col("n_id").as("q_id"), col("q_id").as("n_id")))
        allPairs(cold).unionByName(sym).distinct()
    }
  }
}
