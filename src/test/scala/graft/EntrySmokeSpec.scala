package graft

/** Smoke: the driver's entry contract returns rows on sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
