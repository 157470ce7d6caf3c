package graft

import org.apache.spark.sql.functions._

/** Bucketing demo: pre-bucketing both join sides on the key makes the join
  * shuffle-free — the co-located-join layout a 100 TB fact/fact join needs
  * (SURVEY scale notes). Asserted on the physical plan, not assumed.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // explicit per-table paths (warehouse.dir is a static conf)
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/li_b").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/o_b").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    // only the final groupBy aggregation may shuffle; the join itself is
    // bucket-co-located
    assert(countShuffles(plan) <= 1, plan.toString)

    // sanity: same result as the unbucketed join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(bucketed == plain)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
