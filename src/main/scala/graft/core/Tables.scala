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
  /** events.ts has shipped under two physical parquet encodings across
    * testdata generations: TIMESTAMP(NANOS) (readable only as raw Long via
    * the legacy conf) and TIMESTAMP(MICROS) (reads natively, NTZ or LTZ
    * depending on isAdjustedToUTC). Branch on the loaded type so the loader
    * survives driver-side regeneration:
    *   - LongType           → raw ns; floor-truncate to µs TimestampType.
    *     DuckDB (the oracle) reads the same column as µs TIMESTAMP with the
    *     SAME floor, so parity is structural, not data-dependent.
    *   - Timestamp(_NTZ)    → already µs; cast to session TimestampType
    *     (session TZ is UTC, matching DuckDB's NTZ read — a pure re-tag).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // no-op for µs-encoded files; required before the scan for ns-encoded ones
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, d, "events")
    val ts = df.schema("ts").dataType match {
      // integer `div` — a double division would lose precision on 1.7e18 ns
      case LongType                        => expr("timestamp_micros(ts div 1000)")
      case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
      case other =>
        throw new IllegalStateException(s"events.ts: unexpected physical type $other")
    }
    df.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
