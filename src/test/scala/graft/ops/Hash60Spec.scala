package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd Hash60 Expression must be value-identical to the composed
  * built-in form conv(substring(md5(x),1,15),16,10) — which is what the
  * DuckDB oracles mirror — and to the JVM-side Sketches.hash60jvm.
  */
class Hash60Spec extends SparkSpec {

  test("Hash60 equals the composed md5-prefix form on corpus text + edges") {
    import spark.implicits._
    val edge = Seq("", " ", "a", "ü", "日本語テキスト", "0", "-1", "null",
      "x" * 10000, "line\nbreak\ttab")
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val df = (edge ++ corpus).toDF("s")
      .select(
        TextAnalysis.hash60(col("s")).as("fast"),
        TextAnalysis.hash60Composed(col("s")).as("composed"))
    assert(df.filter(col("fast") =!= col("composed")).count() == 0)
    assert(df.count() == edge.size + corpus.size)
  }

  test("Hash60 agrees with hash60jvm and propagates nulls") {
    import spark.implicits._
    val vals = Seq("abc", "", "グラフト")
    val rows = vals.toDF("s").select(TextAnalysis.hash60(col("s"))).as[Long].collect()
    assert(rows.toSeq == vals.map(Sketches.hash60jvm))
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextAnalysis.hash60(col("s")).as("h")).collect()
    assert(n.head.isNullAt(0))
  }

  test("Hash60 works inside higher-order lambdas (shingle path)") {
    import spark.implicits._
    val out = Seq("hello world foo").toDF("text")
      .select(Dedup.shingleHashes(col("text"), 3).as("sh"))
      .as[Seq[Long]].collect().head
    assert(out.nonEmpty && out.forall(h => h >= 0 && h < Dedup.MinhashP))
  }

  test("graft_hash60 SQL registration uses the expression and matches") {
    graft.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_hash60('abc') AS h").collect().head.getLong(0)
    assert(r == Sketches.hash60jvm("abc"))
  }
}
