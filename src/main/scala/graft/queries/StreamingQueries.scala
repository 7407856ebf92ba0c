package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.StreamingOps

/** Structured-streaming coverage (SURVEY.md §2.10) driven through the
  * batch correctness gate: the streaming query runs to completion with
  * `Trigger.AvailableNow` and its materialized output is compared against
  * a plain-SQL oracle, so the stateful streaming path (event-time
  * sessionization via `flatMapGroupsWithState`) is held to the same
  * hash-match standard as every batch operator.
  *
  * Determinism contract: events are staged to a single parquet file (one
  * micro-batch), each user gets one far-future sentinel event whose
  * arrival closes the user's last real session *inside* the batch — so
  * every real session is emitted exactly once through the in-batch gap
  * logic, with no reliance on timeout/no-data-batch timing. The sentinel
  * sessions themselves stay in state and are never emitted. Event times
  * are carried as integral microseconds and values are dyadic quarter
  * steps, so min/max/count/sum are exact and order-free.
  */
object StreamingQueries {

  private val GapUs = 30L * 60 * 1000000 // 30 min in micros

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_sessionize" -> ((s, dir) => {
      import graft.Tables
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          unix_micros(col("ts")).as("ts_ms"), // integral us carried in the ms slot
          (col("event_id") % 100).cast("double") * 0.25 as "value")
      val sentinelTs = ev.agg(max(col("ts_ms"))).collect()(0).getLong(0) + 10 * GapUs
      val staged = ev.unionAll(
        ev.select(col("user_id")).distinct()
          .select(col("user_id"), lit(sentinelTs).as("ts_ms"), lit(0.0).as("value")))
      val staging = s"/tmp/graft_stream_stage/${math.abs(dir.hashCode)}"
      staged.coalesce(1).write.mode("overwrite").parquet(staging)

      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("ts_ms", LongType),
        StructField("value", DoubleType)))
      val stream = s.readStream.schema(schema).parquet(staging)
        .as[StreamingOps.Event](org.apache.spark.sql.Encoders.product[StreamingOps.Event])
      val sessions = StreamingOps.sessionize(stream, GapUs)

      val sinkName = s"graft_sessions_${math.abs(dir.hashCode)}"
      val q = sessions.writeStream
        .format("memory").queryName(sinkName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
        .select(col("user_id"), col("start_ms").as("start_us"),
          col("end_ms").as("end_us"), col("n_events"), col("sum_value"))
    }),

    // streaming exact dedup: the stateful dropDuplicates path. Staging
    // triples ~half the events (exact row copies), the stream must emit
    // each event_id exactly once; duplicates are bit-identical rows so
    // "which copy survives" is not observable — deterministic under
    // AvailableNow regardless of batch split.
    "st02_stream_dedup" -> ((s, dir) => {
      import graft.Tables
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      val staged = ev
        .unionAll(ev.filter(col("event_id") % 3 === 0))
        .unionAll(ev.filter(col("event_id") % 7 === 0))
      val staging = s"/tmp/graft_stream_dedup/${math.abs(dir.hashCode)}"
      staged.coalesce(1).write.mode("overwrite").parquet(staging)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("us", LongType), StructField("value", DoubleType)))
      val sinkName = s"graft_dedup_${math.abs(dir.hashCode)}"
      val q = s.readStream.schema(schema).parquet(staging)
        .dropDuplicates("event_id")
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
    }))

  val oracles: Map[String, String] = Map(
    // gap sessionization restated over plain windows; the sentinel rows
    // exist only in the staging copy, so the oracle sees real events only
    "st01_stream_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(event_id % 100 AS DOUBLE)*0.25 AS value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, us, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
        |  COUNT(*) AS n_events, SUM(value) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // duplicates exist only in the staging copy; distinct event rows ARE
    // the oracle (event_id is unique in the source table)
    "st02_stream_dedup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us, value
        |FROM events""".stripMargin)
}
