package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  test("extensions inject normalize_value into a fresh session") {
    // getOrCreate would reuse the shared test session (extensions apply at
    // build time), so build on the existing context via newSession + manual
    // registration path, then check the injector itself applies cleanly.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    graft.etl.NormalizeValue.register(spark)
    val r = spark.sql("SELECT normalize_value('45%').out_d AS d").collect().head
    assert(r.getDouble(0) == 0.45)
  }

  test("graft_* SQL functions evaluate identically to their Column forms") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val texts = Seq("A  b", "one two three", "Hello, World 42!", " padded  ")
    val df = texts.toDF("t")
    val viaSql = df.createOrReplaceTempView("gx_t")
    val sql = spark.sql(
      """SELECT graft_fingerprint(t) AS fp, graft_hash60(t) AS h,
                graft_token_count(t) AS n, graft_subword_count(t) AS sw
         FROM gx_t""").collect()
    val api = df.select(
      graft.ops.TextAnalysis.fingerprint($"t").as("fp"),
      graft.ops.TextAnalysis.hash60($"t").as("h"),
      graft.ops.TextAnalysis.tokenCount($"t").as("n"),
      graft.ops.TextAnalysis.regexTokenCount($"t").as("sw")).collect()
    assert(sql.map(_.toString).toSeq == api.map(_.toString).toSeq)
  }

  test("graft_url_canonicalize SQL form equals the scalar canonicalizer") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val urls = Seq("HTTPS://A.Example.COM:443/a/./b/../Doc#f",
      "http://h/%64oc", "not a url")
    urls.toDF("u").createOrReplaceTempView("gx_u")
    val got = spark.sql("SELECT graft_url_canonicalize(u) AS c FROM gx_u")
      .collect().map(_.getString(0)).toSeq
    assert(got == urls.map(graft.ops.Url.canonicalize))
  }

  test("graft_minhash_sig / graft_shingle_set SQL forms equal the Column forms") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox", "ab", "xyzxyzxyzxyz").toDF("text")
    df.createOrReplaceTempView("gx_mh")
    val sqlSig = spark.sql("SELECT graft_minhash_sig(text, 5, 8) AS s FROM gx_mh")
      .collect().map(_.getSeq[Any](0))
    val apiSig = df.select(graft.ops.Dedup.minhashSig(col("text"), 5, 8).as("s"))
      .collect().map(_.getSeq[Any](0))
    assert(sqlSig.toSeq == apiSig.toSeq)
    val sqlSh = spark.sql("SELECT graft_shingle_set(text, 5) AS s FROM gx_mh")
      .collect().map(_.getSeq[Long](0))
    val apiSh = df.select(graft.ops.Dedup.shingleHashesFused(col("text"), 5).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sqlSh.toSeq == apiSh.toSeq)
    intercept[Exception](spark.sql("SELECT graft_shingle_set(text) FROM gx_mh").collect())
  }

  test("graft_morton SQL function equals the generated Column expression") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (65535L, 65535L), (4242L, 1717L))
      .toDF("p16", "s16")
    df.createOrReplaceTempView("gx_m")
    val sql = spark.sql("SELECT graft_morton(p16, s16) AS z FROM gx_m")
      .collect().map(_.getLong(0))
    val api = df.select(expr(graft.ops.Sketches.sparkMorton("p16", "s16")).as("z"))
      .collect().map(_.getLong(0))
    assert(sql.toSeq == api.toSeq)
    assert(sql.take(4).toSeq == Seq(1L, 2L, 15L, (1L << 32) - 1))
  }
}
