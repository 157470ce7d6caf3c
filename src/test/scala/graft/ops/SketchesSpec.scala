package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Sketch determinism + accuracy gates. The cross-engine EXACTNESS of each
  * sketch is proven by the DuckDB oracles (sketch01-03); these specs pin the
  * JVM↔Column hash agreement, the estimator guarantees, and the bit-math
  * invariants that the oracles build on.
  */
class SketchesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("hash60jvm matches the Column-side hash60 exactly") {
    import spark.implicits._
    val samples = Seq("", "a", "srp:3:17", "bf0:4242", "cm2:1999", "ünïcôdé")
    val fromCol = samples.toDF("s")
      .select(TextAnalysis.hash60(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val fromJvm = samples.map(Sketches.hash60jvm)
    assert(fromCol.toSeq == fromJvm)
  }

  test("KMV estimate is within 15% of the exact distinct count") {
    val row = graft.SparkEntry.queries("sketch01_kmv_distinct")(spark, sf).collect().head
    val est = row.getAs[Long]("est_distinct").toDouble
    val exact = row.getAs[Long]("exact_distinct").toDouble
    assert(exact > 100, s"degenerate test data: exact=$exact")
    assert(math.abs(est - exact) / exact < 0.15, s"est=$est exact=$exact")
  }

  test("KMV typed Aggregator == declarative bottom-k plan == SQL udaf") {
    val declarative = graft.SparkEntry.queries("sketch01_kmv_distinct")(spark, sf)
      .collect().head.getAs[Long]("est_distinct")
    val agg = graft.SparkEntry.queries("sketch04_kmv_agg")(spark, sf)
      .collect().head.getAs[Long]("est_distinct")
    assert(agg == declarative, s"aggregator=$agg declarative=$declarative")

    KmvAggregator.registerSql(spark)
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_kmv")
    val viaSql = spark.sql(
      "SELECT kmv_distinct(CAST(l_partkey AS STRING)) AS e FROM li_kmv")
      .collect().head.getAs[Long]("e")
    assert(viaSql == declarative, s"sql=$viaSql declarative=$declarative")
  }

  test("count-min never underestimates (one-sided error guarantee)") {
    val rows = graft.SparkEntry.queries("sketch02_cm_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"), r.toString)
    }
  }

  test("bloom pre-join has zero false negatives and bounded false positives") {
    val row = graft.SparkEntry.queries("sketch03_bloom_prejoin")(spark, sf).collect().head
    assert(row.getAs[Long]("n_false_neg") == 0L, row.toString)
    val fp = row.getAs[Long]("n_false_pos").toDouble
    val pass = row.getAs[Long]("n_bloom_pass").toDouble
    val exact = row.getAs[Long]("n_exact")
    assert(row.getAs[Long]("n_bloom_pass") >= exact, row.toString)
    // 32768 bits / 3 hashes: fp rate ≪ 5% of probes at these key counts
    assert(pass == 0 || fp / pass < 0.25, row.toString)
  }

  test("morton interleave: known values and monotone bucket locality") {
    import spark.implicits._
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 65535L), (21845L, 0L))
      .toDF("p16", "s16")
      .withColumn("z", expr(Sketches.sparkMorton("p16", "s16")))
    val z = df.collect().map(_.getAs[Long]("z"))
    // x occupies even bits, y odd bits
    assert(z(0) == 1L)
    assert(z(1) == 2L)
    assert(z(2) == 15L)
    assert(z(3) == (1L << 32) - 1)
    // 0x5555 (alternating bits) spreads to 0x11111111 on the even positions
    assert(z(4) == 0x11111111L)
    assert((z(4) & 0xAAAAAAAAL) == 0L) // no odd bits set when y=0
  }

  test("SRP signature: Column form equals a JVM recomputation per vector") {
    import spark.implicits._
    val dim = 8
    val w = Array.tabulate(4, dim)((b, i) => Sketches.srpWeight(b, i))
    val vecs = Seq(
      Array(0.5, -1.0, 2.0, 0.25, -0.125, 3.0, -2.5, 1.0),
      Array.fill(dim)(0.0),
      Array(-1.0, -1.0, -1.0, -1.0, 1.0, 1.0, 1.0, 1.0))
    val got = vecs.toDF("v")
      .select(Sketches.srpSignature(col("v"), w).as("sig"))
      .collect().map(_.getInt(0))
    val want = vecs.map { v =>
      (0 until 4).map { b =>
        val dot = (0 until dim).map(i => v(i) * w(b)(i).toDouble).sum
        if (dot >= 0) 1 << b else 0
      }.sum
    }
    assert(got.toSeq == want)
  }

  test("sim04 candidates are a subset re-rank: every reported cos is exact") {
    val rows = graft.SparkEntry.queries("sim04_srp_lsh")(spark, sf).collect()
    assert(rows.nonEmpty, "no LSH candidates at sf0.001 — banding too narrow")
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001, r.toString)
    }
    // rnk is dense 1..k per query
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val rnks = rs.map(_.getAs[Int]("rnk")).sorted
      assert(rnks.toSeq == (1 to rnks.length).toSeq)
    }
  }
}
