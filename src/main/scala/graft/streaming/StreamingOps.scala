package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators. The reference is batch-only (SURVEY.md
  * §2.10 — no streaming in any crate); stateless spatial/text expressions
  * work in streams for free, and this module adds the genuinely stateful
  * piece a training-data ingest pipeline needs: event-time sessionization
  * with custom state (`flatMapGroupsWithState`), the scalable
  * one-state-per-key pattern.
  */
object StreamingOps {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class SessionState(start_ms: Long, last_ms: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, sum_value: Double)

  /** Gap-based sessions per user: a session closes `gapMs` after its last
    * event (by event-time watermark) and is emitted exactly once. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[SessionState]
    implicit val so = Encoders.product[Session]

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, s.start_ms, s.last_ms, s.n, s.sum))
      } else {
        val evs = batch.toSeq.sortBy(_.ts_ms)
        var out = List.empty[Session]
        var cur = state.getOption
        evs.foreach { e =>
          cur match {
            case Some(s) if e.ts_ms - s.last_ms > gapMs =>
              out = Session(userId, s.start_ms, s.last_ms, s.n, s.sum) :: out
              cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
            case Some(s) =>
              cur = Some(SessionState(s.start_ms, math.max(s.last_ms, e.ts_ms),
                s.n + 1, s.sum + e.value))
            case None =>
              cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last_ms + gapMs)
        }
        out.reverseIterator
      }
    }

    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[Event](Encoders.product[Event])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-stream spatial join.
    *
    * Structured Streaming's stream-stream join requires an equi key for
    * state partitioning — a spatial theta predicate has none, but the
    * grid-cell decomposition of the batch grid join provides one: both
    * sides explode their envelope's covering cells and equi-join on cell
    * id, then bbox overlap + reference-cell dedup + the exact predicate
    * refine, exactly as in `SpatialJoins.gridJoin`. `timeCond` (an
    * event-time range over the two sides' watermarked timestamp columns,
    * e.g. `l_ts BETWEEN r_ts - INTERVAL 10 SECONDS AND r_ts + INTERVAL 10
    * SECONDS`) bounds the join state so old rows age out — the standard
    * stream-stream contract.
    *
    * Both inputs MUST carry `withWatermark` on the columns `timeCond`
    * references. `bounds` must be given (a pre-pass action is impossible
    * on an unbounded stream).
    */
  def streamSpatialJoin(left: DataFrame, right: DataFrame,
      leftGeom: Column, rightGeom: Column, predicate: String,
      bounds: (Double, Double, Double, Double),
      timeCond: Column,
      nx: Int = 64, ny: Int = 64,
      distance: Option[Column] = None): DataFrame =
    graft.operators.SpatialJoins.gridJoin(left, right, leftGeom, rightGeom,
      predicate, bounds = Some(bounds), nx = nx, ny = ny,
      distance = distance, extraCond = Some(timeCond))
}
