package graft.ops

import graft.SparkSpec

/** Structural invariants for the round-6 operator additions (boilerplate
  * scrub, PQ/ADC, RRF fusion, water-filling, embedding drift, zone-map
  * audit, split assignment). Exact values are pinned by the DuckDB oracle
  * gate at all three SFs; these assert the semantic properties that hold
  * at ANY scale factor, so a refactor that breaks the contract fails here
  * before the oracle run.
  */
class Round6OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  test("dedup14: kept-token arithmetic is exact and counts are consistent") {
    val out = rows("dedup14_boilerplate")
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("toks_kept") ==
        r.getAs[Long]("n_tokens") - 8L * r.getAs[Long]("n_dropped"))
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("docs_touched") <= r.getAs[Long]("n_docs"))
    }
  }

  test("sim07: exactly top-3 per query; ADC is a nonnegative squared distance") {
    val out = rows("sim07_pq_adc")
    val perQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.size == 20)
    perQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == Seq(1, 2, 3))
    }
    out.foreach { r =>
      assert(r.getAs[Double]("adc") >= -1e-9)
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("sim08: fused rows carry at least one leg rank; rrf matches the ranks") {
    val out = rows("sim08_rrf_fusion")
    assert(out.groupBy(_.getAs[Long]("q_id")).size == 10)
    out.foreach { r =>
      val rv = Option(r.getAs[Integer]("rank_vec")).map(_.toInt)
      val rl = Option(r.getAs[Integer]("rank_lex")).map(_.toInt)
      assert(rv.isDefined || rl.isDefined)
      val expect = rv.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        rl.map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-15)
      assert(r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 5)
    }
  }

  test("mix03: quotas respect availability and the budget balances exactly") {
    val out = rows("mix03_water_filling")
    val budget = out.map(_.getAs[Long]("chars")).sum / 2
    val allocated = out.map(_.getAs[Long]("quota")).sum
    val un = out.head.getAs[Long]("unallocated")
    assert(allocated + un == budget)
    out.foreach { r =>
      assert(r.getAs[Long]("quota") <= r.getAs[Long]("chars"))
      if (r.getAs[Int]("saturated") == 1)
        assert(r.getAs[Long]("quota") == r.getAs[Long]("chars"))
    }
  }

  test("qc10: every label reports both halves; shift is a nonnegative distance") {
    val out = rows("qc10_embedding_drift")
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_batch") > 0)
      assert(r.getAs[Double]("shift2") >= -1e-9)
    }
  }

  test("layout08: z-order skips files, key-hash cannot; both agree on matches") {
    val out = rows("layout08_zonemap_skip")
    val z = out.find(_.getAs[String]("layout") == "zorder").get
    val h = out.find(_.getAs[String]("layout") == "keyhash").get
    assert(z.getAs[Long]("rows_match") == h.getAs[Long]("rows_match"))
    assert(z.getAs[Long]("skip_ppm") > h.getAs[Long]("skip_ppm"))
    // scanned files must cover every matching row
    assert(z.getAs[Long]("rows_scanned") >= z.getAs[Long]("rows_match"))
    assert(h.getAs[Long]("rows_scanned") >= h.getAs[Long]("rows_match"))
  }

  test("samp06: splits partition the corpus and dominate in the right order") {
    val out = rows("samp06_split_assign")
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.core.Tables.documents(spark, sf).count())
    val bySplit = out.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }
}
