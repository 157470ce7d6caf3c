package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused NormalizeValue Catalyst expression must agree with the Column
  * chain (NormalizeCol) on every branch, stay inside whole-stage codegen,
  * and be callable from SQL after registration.
  */
class NormalizeExprSpec extends SparkSpec {

  private val battery = Seq(
    "NA", "n/a", "", "nan", "true", "YES", "1", "false", "no", "0",
    "45%", "12.5%", "a@b.com", "John.Doe+tag@Example.COM",
    "+1 (555) 123-4567", "123", "0042", "$1,234", "₹99", "12.5", "1e5",
    "2025-11-11T20:30:00Z", "2025-11-11 20:30:00", "Hello World",
    "99999999999999999999999999", null)

  test("fused expression agrees with the Column chain on all branches") {
    import spark.implicits._
    val df = battery.toDF("val").cache()
    val fused = df.select(
      col("val"),
      NormalizeValue(col("val")).as("nv"))
      .select(col("val"), col("nv.branch"), col("nv.out_s"), col("nv.out_b"),
        col("nv.out_i"), col("nv.out_d"))
    val chain = df.select(
      col("val"),
      NormalizeCol.branch(col("val")).as("branch"),
      NormalizeCol.outStr(col("val")).as("out_s"),
      NormalizeCol.outBool(col("val")).as("out_b"),
      NormalizeCol.outInt(col("val")).as("out_i"),
      NormalizeCol.outFloat(col("val")).as("out_d"))
    val f = fused.collect().map(_.toSeq).toSeq
    val c = chain.collect().map(_.toSeq).toSeq
    assert(f == c, s"fused=$f\nchain=$c")
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(NormalizeValue(col("text")).getField("branch").as("b"))
    val hasWscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWscg, df.queryExecution.executedPlan.toString)
    assert(df.groupBy(col("b")).count().collect().nonEmpty)
  }

  test("registered SQL function works") {
    import spark.implicits._
    NormalizeValue.register(spark)
    battery.take(3) // force df
    Seq("45%").toDF("v").createOrReplaceTempView("nv_in")
    val out = spark.sql("SELECT normalize_value(v).branch AS b, normalize_value(v).out_d AS d FROM nv_in")
      .collect().head
    assert(out.getString(0) == "percent" && out.getDouble(1) == 0.45)
  }
}
