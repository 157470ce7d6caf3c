package graft

import org.apache.spark.sql.functions._

/** Hive-style partitioned writes + partition pruning: the layout that turns
  * a 100 TB scan into a single-partition read when the predicate hits the
  * partition column. Pruning asserted on the scan node, not assumed.
  */
class PartitionedWriteSpec extends SparkSpec {

  test("partitionBy write → partition-pruned read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/orders"
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("status", col("o_orderstatus"))
    o.write.mode("overwrite").partitionBy("status").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(status"), scan)
    // only the F partition directory is read
    val n = pruned.count()
    val expected = o.filter(col("o_orderstatus") === "F").count()
    assert(n == expected && n > 0)
  }

  test("sketches: count-min and bloom filter behave within bounds") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // CMS overestimates but never underestimates
    val cms = li.stat.countMinSketch("l_suppkey", eps = 0.01, confidence = 0.95, seed = 42)
    val exact = li.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.take(20).foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"CMS underestimated $k: $est < $cnt")
      assert(est <= cnt + (0.01 * li.count()).toLong + 1)
    }
    // Bloom filter: no false negatives
    val bloom = li.stat.bloomFilter("l_orderkey", expectedNumItems = 10000, fpp = 0.01)
    val keys = li.select("l_orderkey").distinct().collect().map(_.getLong(0))
    assert(keys.forall(bloom.mightContain))
    // false-positive rate on absent keys stays near fpp
    val absent = (1 to 2000).map(i => 10000000L + i)
    val fp = absent.count(bloom.mightContain).toDouble / absent.size
    assert(fp < 0.05, s"bloom fp rate $fp")
  }
}
