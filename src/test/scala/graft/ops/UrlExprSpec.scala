package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** UrlCanonicalize Expression ≡ Url.canonicalize, through real codegen. */
class UrlExprSpec extends SparkSpec {

  test("expression equals the scalar canonicalizer on mess classes and fuzz") {
    import spark.implicits._
    val fuzz = {
      val g = Gen.oneOf(
        Gen.asciiPrintableStr.map("https://H" + _),
        Gen.asciiPrintableStr.map("http://a.com:80/" + _),
        Gen.asciiPrintableStr)
      Iterator.continually(g.sample).flatten.take(200).toSeq
    }
    val inputs = Seq(
      "https://s.example.com/a/./b/../doc/7",
      "https://s.example.com/%64oc/7",
      "https://s.example.com:443/doc/7",
      "HTTPS://s.EXAMPLE.COM/doc/7",
      "https://s.example.com/doc/7#sec2",
      "http://a.com:8080/x?q=%2F#f", "not a url", "") ++ fuzz
    val got = inputs.toDF("u")
      .select(col("u"), UrlCanonicalize(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { u =>
      assert(got(u) == Url.canonicalize(u), s"input '$u'")
    }
  }

  test("url01's projection runs inside whole-stage codegen") {
    val p = graft.SparkEntry.queries("url01_canonicalize")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(p.contains("graft_url_canonicalize"), p)
    assert(!p.contains("DeserializeToObject"), p) // no typed-map break
  }
}
