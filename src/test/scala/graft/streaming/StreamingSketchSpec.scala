package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming KMV distinct-count: bounded per-group state (k longs), exact
  * agreement with a JVM recomputation of the same sketch over the same
  * data — the stream/batch symmetry contract for sketches. Incremental
  * chunk feeding exercises the state merge path (not just one batch).
  */
class StreamingSketchSpec extends SparkSpec {

  test("streaming KMV matches the batch bottom-k estimate exactly") {
    import spark.implicits._
    val k = 64
    // two groups: one far above k distinct (estimator active), one below
    // (bottom-k holds the full distinct set → exact count)
    val big = (0 until 1500).map(i => ("big", s"u${i % 997}"))
    val small = (0 until 100).map(i => ("small", s"v${i % 23}"))
    val all = new scala.util.Random(42).shuffle(big ++ small)

    val in = MemoryStream[(String, String)](spark)
    val q = EventStreams.streamingDistinct(in.toDS(), k)
      .writeStream.format("memory").queryName("kmvstream")
      .outputMode("update").start()
    try {
      // three chunks: state must merge across micro-batches
      all.grouped(600).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      val rows = spark.table("kmvstream").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("n_hashes"), r.getAs[Long]("est_distinct")))
      // final emission per key = the one that has seen the most values
      val last = rows.groupBy(_._1).map { case (key, rs) =>
        key -> { val m = rs.maxBy(_._2); (m._3, m._4) }
      }

      def expected(key: String, values: Seq[String]): (Long, Long) = {
        val hs = values.map(Sketches.hash60jvm).distinct.sorted.take(k)
        val est =
          if (hs.length < k) hs.length.toLong
          else math.round((k - 1).toDouble * Sketches.HashSpace / hs.last.toDouble)
        (hs.length.toLong, est)
      }
      val (bigN, bigEst) = expected("big", big.map(_._2))
      val (smallN, smallEst) = expected("small", small.map(_._2))
      assert(last("big") == ((bigN, bigEst)), last("big").toString)
      assert(last("small") == ((smallN, smallEst)), last("small").toString)
      // sanity on the estimator itself: 997 true distinct, k=64 → within 25%
      assert(math.abs(bigEst - 997.0) / 997.0 < 0.25, s"est=$bigEst")
      assert(smallEst == 23L)
    } finally q.stop()
  }
}
