package graft.ops

import graft.SparkSpec
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Invariant checks for the corpus-preparation pack (decontamination,
  * sequence packing, weighted sampling, AMS F2, KMV set ops). Exact values
  * are pinned by the DuckDB oracle gate; these specs assert the structural
  * invariants that hold at ANY scale factor, so a refactor that breaks the
  * semantics fails here before the oracle run.
  */
class CorpusSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // Resolve through the full Registry, not a single pack: queries move
  // between pack files as families split, and a pack-scoped lookup strands
  // the spec (round-10 regression: qc01/clust01 moved to QcQueries).
  private def run(name: String) =
    Registry.all.find(_.name == name).get.run(spark, sf)

  test("decon01: partitions train docs completely and flags a subset") {
    val out = run("decon01_eval_overlap").collect()
    val docs = graft.core.Tables.documents(spark, sf)
    val nTrain = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(out.map(_.getAs[Long]("n_train")).sum == nTrain)
    out.foreach { r =>
      assert(r.getAs[Long]("n_contam") >= 0)
      assert(r.getAs[Long]("n_contam") <= r.getAs[Long]("n_train"))
    }
  }

  test("decon01: a planted eval 4-gram contaminates exactly the sharing docs") {
    // doc 0 is eval (0 % 97 == 0); doc 1 shares a 4-gram, doc 2 does not
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "web"),
      (1L, "zzz alpha beta gamma delta", "en", "web"),
      (2L, "one two three four five six", "en", "web"),
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.all.find(_.name == "decon01_eval_overlap").get
      .run(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_train") == 2)
    assert(out.head.getAs[Long]("n_contam") == 1)
  }

  test("pack01: totals partition the corpus; seq counts match the budget") {
    val out = run("pack01_seq_packing").collect()
    val docs = graft.core.Tables.documents(spark, sf)
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      val (tok, seqs) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_seqs"))
      assert(seqs == (tok + 511) / 512, s"shard ${r.getAs[Long]("shard")}")
      assert(r.getAs[Long]("n_straddle") <= r.getAs[Long]("n_docs"))
    }
  }

  test("samp03: draws exactly min(100, corpus) docs, biased to high weights") {
    val out = run("samp03_weighted").collect()
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_sampled")).sum == math.min(100L, n))
  }

  test("sketch07: exact F2 is the true second moment; estimate is positive") {
    val out = run("sketch07_ams_f2").collect()
    assert(out.length == 1)
    val li = graft.core.Tables.lineitem(spark, sf)
    val trueF2 = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect().head.getLong(0)
    assert(out.head.getAs[Long]("exact_f2") == trueF2)
    assert(out.head.getAs[Long]("est_f2") > 0)
  }

  test("qc01: outlier flags partition the rows; Chebyshev bounds the flag rate") {
    val out = run("qc01_zscore_outliers").collect()
    val total = graft.core.Tables.lineitem(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    out.foreach { r =>
      // P(|X−μ| > 2σ) ≤ 1/4 (Chebyshev) — with exact μ/σ the flag count
      // must respect it
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n") / 4 + 1)
    }
  }

  test("clust01: k-means assignment partitions the corpus into ≤ k clusters") {
    val out = run("clust01_kmeans").collect()
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == n)
    assert(out.length <= 8)
    out.foreach(r => assert((0 until 8).contains(r.getAs[Int]("cluster"))))
  }

  test("sketch08: estimates land near the exact union/intersection") {
    val r = run("sketch08_kmv_setops").collect().head
    val (estU, exU) = (r.getAs[Long]("est_union"), r.getAs[Long]("exact_union"))
    val (estI, exI) = (r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter"))
    assert(exI <= exU)
    // k=256 → σ ≈ 1/√256 ≈ 6%; 25% is a 4σ bound (deterministic here anyway
    // — the assert documents the accuracy contract, the oracle pins the value)
    assert(math.abs(estU - exU).toDouble / exU < 0.25, s"estU=$estU exU=$exU")
    assert(math.abs(estI - exI).toDouble / math.max(exI, 1) < 0.35, s"estI=$estI exI=$exI")
  }
}
