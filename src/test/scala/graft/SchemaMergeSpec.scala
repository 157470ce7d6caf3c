package graft

import org.apache.spark.sql.functions._

/** etl13: the mergeSchema read unifies drifted batches — the early batch's
  * missing column back-fills as NULL, the late batch keeps its values.
  */
class SchemaMergeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("etl13: merged read back-fills the added column with NULLs") {
    val out = SparkEntry.queries("etl13_schema_merge")(spark, sf).collect()
      .map(r => r.getAs[Int]("batch") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_null_date"))).toMap
    val orders = graft.core.Tables.orders(spark, sf)
    val early = orders.filter(year(col("o_orderdate")) < 1998).count()
    val late = orders.filter(year(col("o_orderdate")) >= 1998).count()
    assert(out(1) == ((early, early))) // every pre-drift row has NULL date
    assert(out(2) == ((late, 0L)))     // every post-drift row kept its date
  }
}
