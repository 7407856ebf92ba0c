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

  /** events.parquet has shipped `ts` as either TIMESTAMP(NANOS) (which
    * Spark's parquet reader rejects — read nanos as long, floor-truncate
    * to micros, exactly DuckDB's nanosecond->microsecond read) or plain
    * TIMESTAMP(MICROS)/NTZ. Dispatch on the read schema so both vintages
    * of the driver testdata load; either way the column comes out as
    * session-TZ TimestampType (session TZ is pinned UTC, so the NTZ cast
    * preserves the stored micros value bit-for-bit). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
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
