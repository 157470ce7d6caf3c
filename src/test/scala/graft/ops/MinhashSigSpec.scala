package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused MinhashSig Expression must produce identical signatures to the
  * composed form (minhash over distinct shingle hashes) — including
  * multi-byte unicode and texts shorter than the shingle width.
  */
class MinhashSigSpec extends SparkSpec {

  test("fused signature equals the composed form on corpus text + edges") {
    import spark.implicits._
    val edge = Seq("", " ", "abc", "abcd", "abcde", "ü中文ßeéxyz",
      "the same boilerplate text " * 4, "x" * 500, "line\nbreak\ttab chars")
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val rows = (edge ++ corpus).toDF("text")
      .select(
        Dedup.minhash(Dedup.shingleHashes(col("text"), 5), 16).as("composed"),
        Dedup.minhashSig(col("text"), 5, 16).as("fused"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // composed yields per-seed nulls on short text; fused must match
      assert(r.getSeq[Any](0) == r.getSeq[Any](1), r)
    }
  }

  test("fused shingle set equals the composed form, order included") {
    import spark.implicits._
    val edge = Seq("", "abcd", "abcde", "aaaaaaaaaa", "ü中文ßeéxyz",
      "repeat repeat repeat repeat")
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val rows = (edge ++ corpus).toDF("text")
      .select(
        Dedup.shingleHashes(col("text"), 5).as("composed"),
        Dedup.shingleHashesFused(col("text"), 5).as("fused"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("fused forms match composed on NULL input and join whole-stage codegen") {
    import spark.implicits._
    // composed forms fall through when()'s null condition to the
    // empty-shingle branch — NULL text behaves like ''
    val n = Seq[Option[String]](None).toDF("text")
      .select(
        Dedup.minhash(Dedup.shingleHashes(col("text"), 5), 8).as("composed"),
        Dedup.minhashSig(col("text"), 5, 8).as("fused"),
        Dedup.shingleHashes(col("text"), 5).as("composedSh"),
        Dedup.shingleHashesFused(col("text"), 5).as("fusedSh"))
      .collect().head
    assert(n.getSeq[Any](0) == n.getSeq[Any](1), n)
    assert(n.getSeq[Long](2) == n.getSeq[Long](3), n)
    val df = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(Dedup.minhashSig(col("text"), 5, 16).as("sig"))
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }
}
