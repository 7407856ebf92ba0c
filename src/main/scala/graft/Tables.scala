package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for loading the driver testdata and for writing
  * cross-engine-deterministic numeric results.
  *
  * Double sums are order-dependent in IEEE arithmetic and Spark's partial
  * aggregation order is nondeterministic, so any oracle compare on raw
  * `SUM(double)` is flaky. All money-ish sums therefore go through an exact
  * integer cents representation (values in the testdata have <= 2 decimals),
  * mirroring what the DuckDB oracle SQL does.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long and floor-truncate to micros (exactly what
    * DuckDB's nanosecond->microsecond read does, so oracles agree). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Exact sum of a <=2-decimal double column, returned as double. */
  def centsSum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Exact-sum-based average of a <=2-decimal double column. */
  def centsAvg(c: Column): Column =
    sum(round(c * 100).cast("long")) / count(lit(1)) / 100.0

  /** Exact integer cents (long) for a <=2-decimal double expression. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Cross-engine-deterministic 32-bit hash of a string: first 8 hex chars
    * of md5, parsed as unsigned. Identical in DuckDB:
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT`. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")
}
