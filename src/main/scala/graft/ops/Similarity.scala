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
    val withCos = vectors.select(col("id"), col("vec"), norm(col("vec")).as("n"))
      .crossJoin(broadcast(seeds.select(col("id").as("cell_id"), col("vec").as("cell_vec"),
        norm(col("vec")).as("cn"))))
      .select(col("id"), col("vec"), col("cell_id"),
        (dot(col("vec"), col("cell_vec")) / (col("n") * col("cn"))).as("cell_cos"))
    withCos.groupBy(col("id"))
      .agg(
        min_by(struct(col("cell_id"), col("vec")),
          struct((-col("cell_cos")).as("neg"), col("cell_id"))).as("best"))
      .select(col("id"), col("best.cell_id").as("cell_id"), col("best.vec").as("vec"))
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
    * identical argmin, mirrored textually in the SQL oracle), and return
    * `(id, rvec)` where rvec is the concatenated codeword reconstruction.
    *
    * Scale shape: the codebook (subspaces·seeds rows) broadcasts; encode
    * is a broadcast join + one map-side-combinable min_by per (vector,
    * subspace) — the corpus never shuffles on anything but its own id. A
    * codebook-scheme change edits exactly here (+ [[graft.queries
    * .ExtQueries.pqSqlCtes]], its SQL mirror).
    */
  def pqReconstruct(e: DataFrame, subspaces: Int, subDim: Int, seeds: Int): DataFrame = {
    val sub = e
      .select(col("id"), explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("vec"))
      .select(col("id"), col("m"),
        slice(col("vec"), col("m") * subDim + 1, lit(subDim)).as("sv"))
    val cb = sub.filter(col("id") < seeds)
      .select(col("m"), col("id").cast("int").as("code"), col("sv").as("cv"))
    val dkey = dot(col("cv"), col("cv")) - lit(2.0) * dot(col("sv"), col("cv"))
    val enc = sub.join(broadcast(cb), Seq("m"))
      .select(col("id"), col("m"), col("code"), dkey.as("dkey"))
      .groupBy(col("id"), col("m"))
      .agg(min_by(col("code"), struct(col("dkey"), col("code"))).as("code"))
    enc.join(broadcast(cb), Seq("m", "code"))
      .groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("m"), col("cv")))),
        x => x.getField("cv"))).as("rvec"))
  }

  def bandedPairsCapped(banded: DataFrame, cap: Int): DataFrame = {
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
