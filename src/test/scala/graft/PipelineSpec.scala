package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Behavior + plan gates for the production-pipeline pack
  * (PipelineQueries): funnel monotonicity, CDC diff partitioning the
  * keyspace, referential orphans matching the purge rule, domain caps,
  * BM25 broadcast shape, fuzzy-join blocking, compaction conservation.
  */
class PipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("Tables.events is schema-adaptive: same µs values from ns-long and µs-timestamp encodings") {
    import org.apache.spark.sql.types.TimestampType
    // The driver has shipped events.ts under two physical encodings across
    // testdata generations (TIMESTAMP(NANOS), then TIMESTAMP(MICROS)). The
    // loader must yield identical µs TimestampType from either, matching
    // DuckDB's floor-to-µs read. Synthesize the ns-long shape (under the
    // nanosAsLong conf a NANOS column reads as LongType, indistinguishable
    // from plain INT64 at the loader) so BOTH branches stay pinned even when
    // the on-disk testdata only exercises one.
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_ns").toString
    val ns = Seq( // raw ns with sub-µs digits: loader must floor, not round
      (1L, 1700000000123456789L), (2L, 1700000000999999999L), (3L, 1700000001000000001L))
    spark.createDataFrame(ns).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fromNs = graft.core.Tables.events(spark, tmp)
    assert(fromNs.schema("ts").dataType == TimestampType)
    val gotNs = fromNs.selectExpr("event_id", "unix_micros(ts) as us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNs == ns.map { case (id, n) => id -> n / 1000L }.toMap)

    // the real testdata, whatever its current encoding, loads as µs TimestampType
    // and agrees with a native timestamp read of the same file
    val loaded = graft.core.Tables.events(spark, sf)
    assert(loaded.schema("ts").dataType == TimestampType)
    val rawTy = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
    val rawUsExpr = rawTy match {
      case org.apache.spark.sql.types.LongType => "ts div 1000"
      case _                                   => "unix_micros(cast(ts as timestamp))"
    }
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", s"$rawUsExpr as us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val read = loaded.selectExpr("event_id", "unix_micros(ts) as us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw == read)
  }

  test("ev14: funnel stages are monotonically non-increasing") {
    val rows = run("ev14_funnel").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("signup", "click", "purchase"))
    assert(rows("signup") >= rows("click"))
    assert(rows("click") >= rows("purchase"))
  }

  test("ev15: every user is active in their own cohort week (offset 0)") {
    val df = run("ev15_retention")
    val atZero = df.filter(col("week_offset") === 0)
      .agg(sum(col("users"))).collect()(0).getLong(0)
    val users = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(atZero == users)
  }

  test("etl14: op classes partition the key universe and match the mutation rule") {
    val cust = graft.core.Tables.customer(spark, sf)
    val byOp = run("etl14_cdc_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDel = cust.filter(col("c_custkey") % 13 === 0).count()
    val nIns = cust.filter(col("c_custkey") % 11 === 0).count()
    // updates: %7 balance bump, surviving the %13 delete
    val nUpd = cust.filter(col("c_custkey") % 7 === 0 && col("c_custkey") % 13 =!= 0).count()
    assert(byOp("delete") == nDel, byOp)
    assert(byOp("insert") == nIns, byOp)
    assert(byOp("update") == nUpd, byOp)
    assert(byOp.values.sum == cust.count() + nIns, byOp)
  }

  test("qc03: orphan set is exactly the purged parents' orders") {
    val orders = graft.core.Tables.orders(spark, sf)
    val expected = orders.filter(col("o_custkey") % 50 === 0).count()
    val got = run("qc03_referential").agg(sum(col("orphans"))).collect()(0).getLong(0)
    assert(got == expected)
  }

  test("samp04: every source keeps at most 20 documents, one shuffle total") {
    val df = run("samp04_domain_cap")
    df.collect().foreach(r => assert(r.getAs[Long]("kept") <= 20, r))
    // window by source + groupBy source share the source partitioning
    assert(countShuffles(df.queryExecution.executedPlan) <= 1,
      df.queryExecution.executedPlan.toString)
  }

  test("text10: the query set broadcasts; ranks are dense 1..k per query") {
    val df = run("text10_bm25")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    val byQ = df.collect().groupBy(_.getAs[Int]("qid"))
    byQ.values.foreach { rows =>
      val rnks = rows.map(_.getAs[Int]("rnk")).sorted
      assert(rnks.toSeq == (1 to rows.length), rnks.toSeq)
      assert(rows.length <= 5)
    }
  }

  test("dedup11: the blocked join is an equi-join, never a cartesian product") {
    val df = run("dedup11_fuzzy")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    df.collect().foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), r)
      assert(r.getAs[Int]("dist") >= 0 && r.getAs[Int]("dist") <= 30, r)
    }
  }

  test("text12: posting heads are capped at 20 and sorted ascending") {
    run("text12_inverted_index").collect().foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length <= 20, r)
      assert(ids.sameElements(ids.sorted), r)
      assert(r.getAs[Long]("df") >= ids.length, r)
    }
  }

  test("graph01: rank iteration joins broadcast; ranks stay near the mass sum") {
    val df = run("graph01_pagerank")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    val rows = df.collect()
    assert(rows.length == 5)
    // damped fixed-point conserves mass up to integer-floor loss per node
    val total = rows.map(_.getAs[Long]("rank_micro")).sum
    assert(total > 4900000L && total <= 5000000L, total)
  }

  test("vocab01: three distinct merges with non-increasing weighted counts") {
    val rows = run("vocab01_bpe_merges").orderBy(col("it")).collect()
    assert(rows.length == 3)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, cnts.toSeq)
    val pairs = rows.map(_.getAs[String]("pair"))
    assert(pairs.distinct.length == 3, pairs.toSeq)
    pairs.foreach(p => assert(p.split(" ").length == 2, p))
  }

  test("etl15: merged incremental totals cover every ordering customer once") {
    val got = run("etl15_incremental_agg")
    val custs = graft.core.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(got.count() == custs)
    assert(got.groupBy(col("o_custkey")).count().filter(col("count") > 1).count() == 0)
  }

  test("dedup03/dedup02 plans use the fused codegen expressions") {
    val p3 = SparkEntry.queries("dedup03_minhash_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("graft_minhash_sig"), p3)
    val p2 = SparkEntry.queries("dedup02_ngram_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p2.contains("graft_shingle_set"), p2)
  }

  test("samp05: every language keeps exactly the min-class count") {
    val rows = run("samp05_balanced").collect()
    val kepts = rows.map(_.getAs[Long]("kept")).distinct
    assert(kepts.length == 1, rows.mkString(","))
    val minN = graft.core.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().agg(min(col("count"))).collect()(0).getLong(0)
    assert(kepts.head == minN)
  }

  test("pipe01: composed curation keeps at most the domain-cap budget") {
    val docs = graft.core.Tables.documents(spark, sf)
    val sources = docs.select(col("source")).distinct().count()
    val kept = run("pipe01_curation").agg(sum(col("kept"))).collect()(0).getLong(0)
    assert(kept <= sources * 20, s"kept=$kept sources=$sources")
    assert(kept > 0)
  }

  test("layout07: bins conserve file counts and bytes per source") {
    val docs = graft.core.Tables.documents(spark, sf)
    val expect = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("b"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = run("layout07_compaction_bins").groupBy(col("source"))
      .agg(sum(col("files")).as("n"), sum(col("bytes")).as("b"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }
}
