package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd k-means over an embedding column — the IVF coarse-quantizer
  * trainer (sim02's cell structure is exactly this, built offline).
  *
  * Scale shape: centroids are k·dim doubles — driver-sized at any corpus
  * scale — so each iteration is (1) ASSIGN: a pure projection against the
  * centroid LITERALS (no join, no shuffle; the corpus is touched by one
  * codegen'd scan) and (2) UPDATE: one map-side-combinable groupBy into
  * k·dim cells. The per-iteration driver collect is k·dim values, the same
  * "schema-sized" contract as the profiler's column collects.
  *
  * Cross-engine determinism (the DuckDB oracle reproduces every step):
  *   - distances compare as ((v·v + c·c) - 2·(v·c)) with the SAME
  *     association in both engines; dot products fold sequentially
  *     (Spark `aggregate(zip_with(...))` ≡ DuckDB `list_dot_product`,
  *     the sim04-verified pairing); ties break to the lowest cluster id.
  *   - centroid updates quantize components to integers
  *     (round(x·2^20) as long), sum EXACTLY, and divide back in one fixed
  *     order — so the next iteration's literals are bit-identical.
  */
object Clustering {

  val Quant: Double = 1048576.0 // 2^20 — centroid component quantization

  /** argmin cluster id over centroid literals for a double-array column. */
  def assign(v: Column, cents: Seq[(Int, Array[Double])]): Column = {
    val dvv = Similarity.dot(v, v)
    val dists = cents.map { case (cid, c) =>
      // c·c folded sequentially on the driver — same left-to-right order
      // as the engines' list dot products
      val dcc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      cid -> ((dvv + lit(dcc)) - lit(2.0) * Similarity.dotLit(v, c))
    }
    val best = dists.map(_._2).reduce(least(_, _))
    dists.foldRight(lit(-1)) { case ((cid, dist), el) =>
      when(dist === best, lit(cid)).otherwise(el)
    } // foldRight → first (lowest-cid) match wins on ties
  }

  /** one update step: quantized per-dimension means of the assigned
    * vectors, collected to driver literals (k·dim values).
    */
  def updateCentroids(assigned: DataFrame, dim: Int): Seq[(Int, Array[Double])] =
    assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("cid"), col("d"))
      .agg(sum(round(col("x") * Quant).cast("long")).as("sq"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Int]("d"),
        (r.getAs[Long]("sq") / Quant) / r.getAs[Long]("n")))
      .groupBy(_._1)
      .map { case (cid, rows) =>
        val c = new Array[Double](dim)
        rows.foreach { case (_, d, x) => c(d) = x }
        cid -> c
      }
      .toSeq.sortBy(_._1)

  /** `iters` Lloyd rounds from the first-k init; returns the frame with the
    * final assignment in `cid`. `df` must carry (vec_id, v: array<double>).
    */
  def kmeans(df: DataFrame, k: Int, dim: Int, iters: Int): DataFrame = {
    var cents = df.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("v"))
      .collect()
      .map(r => r.getAs[Int]("cid") -> r.getAs[scala.collection.Seq[Double]]("v").toArray)
      .toSeq.sortBy(_._1)
    var assigned = df.withColumn("cid", assign(col("v"), cents))
    for (_ <- 1 until iters) {
      cents = updateCentroids(assigned, dim)
      assigned = df.withColumn("cid", assign(col("v"), cents))
    }
    assigned
  }
}
