package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** int8 quantization invariants: range, extreme mapping, zero vector, and
  * quantized-cosine sanity against the exact cosine.
  */
class SimilarityQuantSpec extends SparkSpec {

  test("quantized values stay in [-127, 127] and max|x| maps to ±127") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(50)(i => (i.toLong, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val q = df.select(col("id"), col("v"), Similarity.quantizeInt8(col("v")).as("qv"))
      .select(col("id"),
        array_max(transform(col("qv"), x => abs(x))).as("qmax"),
        array_min(col("qv")).as("qmin"),
        array_max(col("qv")).as("qmax2"))
      .collect()
    q.foreach { r =>
      assert(r.getLong(1) == 127L, s"max|q| must be 127: $r")
      assert(r.getLong(2) >= -127L && r.getLong(3) <= 127L, r.toString)
    }
  }

  test("zero vector quantizes to zeros (no division by zero)") {
    import spark.implicits._
    val df = Seq((0L, Array(0.0, 0.0, 0.0))).toDF("id", "v")
    val q = df.select(Similarity.quantizeInt8(col("v")).as("qv"))
      .collect().head.getSeq[Long](0)
    assert(q == Seq(0L, 0L, 0L))
  }

  test("quantized cosine tracks exact cosine within quantization error") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = Seq.tabulate(30)(i => (i.toLong, Array.fill(32)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "v")
      .select(col("id"), col("v"),
        Similarity.quantizeInt8(col("v")).as("qv"))
      .withColumn("qn", Similarity.normInt8(col("qv")))
      .withColumn("n", Similarity.norm(col("v")))
    val a = df.select(col("id").as("ia"), col("v").as("va"), col("qv").as("qa"),
      col("qn").as("qna"), col("n").as("na"))
    val b = df.select(col("id").as("ib"), col("v").as("vb"), col("qv").as("qb"),
      col("qn").as("qnb"), col("n").as("nb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"),
        Similarity.cosineInt8(col("qa"), col("qb"), col("qna"), col("qnb")).as("qcos"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.05,
        s"cos=${r.getDouble(0)} qcos=${r.getDouble(1)}")
    }
  }
}
