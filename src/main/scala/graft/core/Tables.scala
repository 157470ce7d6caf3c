package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) so the same code
  * runs at any scale factor. Reads are plain parquet scans: Catalyst pushes
  * filters + column pruning into the scan, which is the scalable path for the
  * 100 TB target (columnar IO, partition pruning on a real cluster layout).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as a long (legacy conf) and convert ns → µs
    * TimestampType. The raw values DO carry sub-µs digits, but DuckDB
    * (the oracle engine) reads the same column as µs TIMESTAMP with the
    * SAME floor-truncation, so every ts comparison, ordering, and output
    * sees identical µs values in both engines — parity is structural,
    * not data-dependent.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, d, "events")
    // integer `div` — a double division would lose precision on 1.7e18 ns
    df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
