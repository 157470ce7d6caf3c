package graft.ops

import graft.SparkSpec

/** Structural invariants for the round-7 operator additions (exact
  * substring dedup, k-center coreset, anneal schedule). Exact values are
  * pinned by the DuckDB oracle gate; these assert the semantic properties
  * that hold at ANY scale factor, so a refactor that breaks the contract
  * fails here before the oracle run.
  */
class Round7OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String) = graft.SparkEntry.queries(name)(spark, sf)
  private def rows(name: String) = df(name).collect()

  test("dedup15: span-union arithmetic is exact; no cartesian in the plan") {
    val out = rows("dedup15_substring")
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("toks_kept") ==
        r.getAs[Long]("n_tokens") - r.getAs[Long]("toks_dropped"), r)
      // merged spans can never drop more than the doc set holds
      assert(r.getAs[Long]("toks_dropped") <= r.getAs[Long]("n_tokens"), r)
      assert(r.getAs[Long]("docs_touched") <= r.getAs[Long]("n_docs"), r)
    }
    // overlapping windows strictly extend dedup14's non-overlapping
    // chunks, so the corpus-wide union drop can never be smaller
    val d15 = out.map(_.getAs[Long]("toks_dropped")).sum
    val d14 = rows("dedup14_boilerplate").map(r => 8L * r.getAs[Long]("n_dropped")).sum
    assert(d15 >= d14, s"substring union $d15 < chunk drop $d14")
    val p = df("dedup15_substring").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("samp07: distinct centers, non-increasing pick radii, weights partition the corpus") {
    val out = rows("samp07_kcenter").sortBy(_.getAs[Int]("pick"))
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("center_id")).distinct.length == 4)
    // greedy k-center: the max-min distance is non-increasing in k
    val d = out.drop(1).map(_.getAs[Long]("d_micro"))
    assert(d.zip(d.tail).forall { case (a, b) => a >= b }, d.toSeq)
    assert(d.forall(_ > 0), d.toSeq)
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_assigned")).sum == n)
  }

  test("layout09: totals conserve the corpus; skew is at least the mean") {
    val out = rows("layout09_bucket_skew")
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(out.length == 4) // 16/64/256 hash widths + the source-key layout
    out.foreach { r =>
      assert(r.getAs[Long]("rows_total") == n, r)
      assert(r.getAs[Long]("buckets_used") <= r.getAs[Long]("n_buckets"), r)
      // max >= mean, so the straggler factor is always >= 1e6 ppm
      assert(r.getAs[Long]("skew_ppm") >= 1000000L, r)
      assert(r.getAs[Long]("top_share_ppm") <= 1000000L, r)
    }
  }

  test("graph03: communities partition the node set") {
    val out = rows("graph03_label_prop")
    assert(out.nonEmpty)
    val e = rows("graph02_triangles").head
    assert(out.map(_.getAs[Long]("n_members")).sum == e.getAs[Long]("n_nodes"))
    out.foreach(r => assert(r.getAs[Long]("n_members") >= 1, r))
  }

  test("ev19: lateness accounting is exact and covers every event") {
    val out = rows("ev19_lateness_audit")
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_events"), r)
      assert(r.getAs[Long]("late_ppm") ==
        r.getAs[Long]("n_late") * 1000000L / r.getAs[Long]("n_events"), r)
      assert(r.getAs[Long]("max_late_us") >= 0, r)
      // a late event implies a positive worst lateness
      assert((r.getAs[Long]("n_late") == 0) == (r.getAs[Long]("max_late_us") == 0), r)
    }
    val total = graft.core.Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("text17: Zipf head is rank-ordered; rank 1 deviation is exactly zero") {
    val out = rows("text17_zipf_audit").sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    val freqs = out.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, freqs.toSeq)
    assert(out.head.getAs[Long]("dev_ppm") == 0L) // pred(1) = f1
    out.foreach { r =>
      assert(r.getAs[Long]("share_ppm") <= 1000000L, r)
      assert(r.getAs[Long]("zipf_pred") ==
        out.head.getAs[Long]("freq") / r.getAs[Int]("rank"), r)
    }
  }

  test("ev20: dropped fraction is monotone non-increasing in the delay budget") {
    val out = rows("ev20_watermark_sweep")
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val byDelay = rs.sortBy(_.getAs[Long]("delay_us"))
      assert(byDelay.map(_.getAs[Long]("delay_us")).toSeq ==
        Seq(60000000L, 600000000L, 3600000000L), et)
      assert(byDelay.map(_.getAs[Long]("n_events")).distinct.length == 1, et)
      val late = byDelay.map(_.getAs[Long]("n_late"))
      assert(late.zip(late.tail).forall { case (a, b) => a >= b }, s"$et ${late.toSeq}")
    }
  }

  test("mix04: each phase's quotas sum exactly to its budget; boost is the top half") {
    val out = rows("mix04_anneal")
    val c = graft.core.Tables.documents(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("source"))
      .count().count()
    assert(out.length == c.toInt)
    val chars = out.map(_.getAs[Long]("chars")).sum
    val b = chars / 2
    val bPre = b * 9 / 10
    assert(out.map(_.getAs[Long]("q_pre")).sum == bPre)
    assert(out.map(_.getAs[Long]("q_ann")).sum == b - bPre)
    assert(out.map(_.getAs[Long]("q_total")).sum == b)
    assert(out.count(_.getAs[Int]("boost") == 1) == (out.length + 1) / 2)
    out.foreach { r =>
      assert(r.getAs[Long]("q_pre") >= 0 && r.getAs[Long]("q_ann") >= 0, r)
      assert(r.getAs[Long]("q_total") ==
        r.getAs[Long]("q_pre") + r.getAs[Long]("q_ann"), r)
    }
  }
}
