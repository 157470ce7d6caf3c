package graft

/** Smoke: the driver's entry contract returns rows on sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("mix02 largest-remainder quotas sum EXACTLY to the 10M budget") {
    val rows = SparkEntry.queries("mix02_epoch_plan")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == 10000000L)
  }
}
