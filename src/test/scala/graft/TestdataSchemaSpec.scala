package graft

/** Environment-drift tripwire (round-7 lesson). The driver regenerates
  * /root/testdata between rounds and has already changed a physical type
  * once (events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS), which broke 26
  * queries + 18 tests at analysis). This spec pins the RAW Spark read
  * schema of every TESTDATA.md table at sf0.001 so any future
  * regeneration surfaces as ONE named (table, column, type) diff at round
  * start instead of a mass failure.
  *
  * If this spec is the only red one: the testdata changed, not the code.
  * Update the pins here, then fix the affected loader in core/Tables.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "INT", "r_name" -> "STRING"),
    "nation" -> Seq("n_nationkey" -> "INT", "n_name" -> "STRING", "n_regionkey" -> "INT"),
    "customer" -> Seq("c_custkey" -> "BIGINT", "c_name" -> "STRING",
      "c_nationkey" -> "INT", "c_acctbal" -> "DOUBLE", "c_mktsegment" -> "STRING"),
    "supplier" -> Seq("s_suppkey" -> "BIGINT", "s_name" -> "STRING",
      "s_nationkey" -> "INT", "s_acctbal" -> "DOUBLE"),
    "part" -> Seq("p_partkey" -> "BIGINT", "p_name" -> "STRING", "p_brand" -> "STRING",
      "p_type" -> "STRING", "p_size" -> "INT", "p_retailprice" -> "DOUBLE"),
    "orders" -> Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
      "o_orderstatus" -> "STRING", "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "TIMESTAMP_NTZ", "o_orderpriority" -> "STRING"),
    "lineitem" -> Seq("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "l_linenumber" -> "INT", "l_quantity" -> "DOUBLE",
      "l_extendedprice" -> "DOUBLE", "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "STRING", "l_linestatus" -> "STRING",
      "l_shipdate" -> "TIMESTAMP_NTZ"),
    "events" -> Seq("event_id" -> "BIGINT", "ts" -> "TIMESTAMP_NTZ",
      "user_id" -> "BIGINT", "event_type" -> "STRING", "value" -> "DOUBLE",
      "props" -> "STRING"),
    "documents" -> Seq("doc_id" -> "BIGINT", "text" -> "STRING", "lang" -> "STRING",
      "source" -> "STRING", "n_chars" -> "BIGINT"),
    "embeddings" -> Seq("vec_id" -> "BIGINT", "embedding" -> "ARRAY<FLOAT>",
      "label" -> "INT")
  )

  test("raw testdata schemas match the pinned (table, column, type) inventory") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (table, want) =>
      val got =
        try Right(spark.read.parquet(s"$sf/$table.parquet").schema
          .map(f => f.name -> f.dataType.sql))
        catch { case e: Exception => Left(s"$table: unreadable: ${e.getMessage.take(200)}") }
      got match {
        case Left(err) => Seq(err)
        case Right(actual) if actual == want => Nil
        case Right(actual) =>
          val a = actual.toMap; val w = want.toMap
          val cols = (a.keySet ++ w.keySet).toSeq.sorted
          cols.collect {
            case c if a.get(c) != w.get(c) =>
              s"$table.$c: expected ${w.getOrElse(c, "<absent>")}, got ${a.getOrElse(c, "<absent>")}"
          }
      }
    }
    assert(diffs.isEmpty, "\nTESTDATA DRIFT (regen suspected — see TestdataSchemaSpec scaladoc):\n  "
      + diffs.mkString("\n  "))
  }

  test("every table is non-empty at sf0.001") {
    expected.keys.toSeq.sorted.foreach { t =>
      assert(spark.read.parquet(s"$sf/$t.parquet").limit(1).count() == 1L, t)
    }
  }
}
