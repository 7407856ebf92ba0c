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

  /** Deployment-scale knob for BOUNDED streaming runs (AvailableNow +
    * awaitTermination inside `body`): micro-batch state machinery opens
    * several state stores per shuffle partition per batch, so at small
    * input volume the per-store commit overhead dominates — run on few
    * partitions and the HEAP provider (measured right at that state
    * volume: BENCH_LOCAL round-12 provider table, st03 m=1 5.6s heap vs
    * 10.9s RocksDB), while the library's RocksDB session default remains
    * right at ingest scale (4.8x vs 15.9x wall growth at m=10 state).
    * A cluster run sizes `partitions` to the data instead.
    *
    * Restore-safety contract (the round-12/13 gate-conf hazard does NOT
    * apply here): `body` must run its streaming query to COMPLETION, so
    * every stateful micro-batch executes inside the window; the only
    * thing that escapes is the materialized memory-sink table, whose
    * later (re)plan is a plain in-memory scan with no state stores and
    * no sensitivity to either conf. This helper lives in the operator
    * layer so no gate body carries a conf.set. */
  /** Unload every loaded state-store provider (the completed query's
    * stores stay registered in the executor until the 60 s maintenance
    * sweep notices the dead queryRunId). A session that runs MANY
    * short-lived streaming queries back to back — the gate suite, any
    * test harness, a notebook — otherwise accumulates dead providers
    * whose maintenance work (snapshot/cleanup attempts against already-
    * deleted temp checkpoints) steals cycles from live queries; measured
    * ~1.3 s/gate of cross-gate drag at 30 queries/session. Results are
    * unaffected: the memory sink owns the output, and the next query
    * loads its providers fresh for its own runId regardless.
    *
    * SEQUENTIAL-ONLY contract (ADVICE r17): the unload is JVM-global
    * (StateStore.unloadAll), so any OTHER streaming query running
    * concurrently in this process has its providers unloaded mid-flight
    * and must reload state from its checkpoint on the next batch —
    * correct but slow. Call this only between queries in a
    * one-query-at-a-time harness (the gate suite); a shared session
    * with parallel streaming queries must not. */
  def drainStateStores(): Unit =
    try org.apache.spark.sql.graft.DatasetBridge.unloadStateStores()
    catch { case _: Throwable => () }

  def withMicroScaleConfs[T](s: org.apache.spark.sql.SparkSession,
      partitions: Int = 8, heapStore: Boolean = true)(body: => T): T = {
    val pKey = "spark.sql.streaming.stateStore.providerClass"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevProv = s.conf.getOption(pKey)
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    if (heapStore) s.conf.set(pKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      prevProv match {
        case Some(v) => s.conf.set(pKey, v)
        case None => s.conf.unset(pKey)
      }
    }
  }

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

  case class AsOfEvent(k: Long, ts_ms: Long, tag: Int, id: Long, value: Double)
  case class AsOfHeld(r_ts: Long, r_id: Long, r_value: Double)
  case class AsOfMatch(k: Long, l_ts: Long, l_id: Long,
      r_ts: Option[Long], r_id: Option[Long], r_value: Option[Double])

  /** Streaming backward as-of join (latest right event at-or-before each
    * left event per key, tolerance-bounded, ties to the largest right
    * id): both sides arrive as one keyed stream of tagged events (tag 0
    * = right, 1 = left) and `flatMapGroupsWithState` keeps exactly ONE
    * held right event per key — O(keys) state, the same per-key
    * invariant the batch sweep (`operators.AsOfJoin`) maintains during
    * its pass. Within each micro-batch the group's events are
    * time-sorted and swept exactly like the batch operator, so a single
    * AvailableNow batch reproduces the batch semantics bit-for-bit;
    * across batches a left event matches the latest right SEEN so far —
    * the streaming temporal-join contract (a right that arrives after
    * the left's batch cannot retroactively match). A held right later
    * than a late left emits unmatched rather than matching forward.
    *
    * O(keys) state is the right invariant, but an unbounded KEY SPACE
    * (100 TB ingest with ephemeral keys) still grows without limit —
    * `idleTtlMs` bounds it: a key idle past watermark + ttl has its held
    * right evicted via event-time timeout. Eviction is RESULT-NEUTRAL
    * when ttl >= toleranceMs (enforced): any future left is at or above
    * the watermark (later arrivals are watermark-dropped), so a right
    * older than watermark - ttl <= watermark - tolerance could only
    * produce matches the tolerance already rejects. Default None keeps
    * the unbounded-retention behavior for stable key spaces. */
  def streamAsOfJoin(events: Dataset[AsOfEvent],
      toleranceMs: Long, idleTtlMs: Option[Long] = None): Dataset[AsOfMatch] = {
    idleTtlMs.foreach(ttl => require(ttl >= toleranceMs,
      s"idleTtlMs ($ttl) must be >= toleranceMs ($toleranceMs) so eviction " +
        "cannot drop a right event a future left could still match"))
    implicit val sh = Encoders.product[AsOfHeld]
    implicit val sm = Encoders.product[AsOfMatch]
    def update(k: Long, batch: Iterator[AsOfEvent],
        state: GroupState[AsOfHeld]): Iterator[AsOfMatch] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      // rights before lefts at equal times (inclusive boundary), largest
      // right id wins ties — q21's deterministic ordering
      val evs = batch.toSeq.sortBy(e => (e.ts_ms, e.tag, e.id))
      var held = state.getOption
      val out = List.newBuilder[AsOfMatch]
      var maxTs = Long.MinValue
      evs.foreach { e =>
        if (e.ts_ms > maxTs) maxTs = e.ts_ms
        if (e.tag == 0) {
          if (held.forall(h => h.r_ts < e.ts_ms ||
              (h.r_ts == e.ts_ms && h.r_id < e.id)))
            held = Some(AsOfHeld(e.ts_ms, e.id, e.value))
        } else {
          val m = held.filter(h =>
            h.r_ts <= e.ts_ms && e.ts_ms - h.r_ts <= toleranceMs)
          out += AsOfMatch(k, e.ts_ms, e.id,
            m.map(_.r_ts), m.map(_.r_id), m.map(_.r_value))
        }
      }
      held.foreach(state.update)
      idleTtlMs.foreach { ttl =>
        if (state.exists)
          // must exceed the current watermark or Spark rejects it; the
          // max() keeps a key whose events lag the watermark evictable
          // at the next watermark advance rather than erroring
          state.setTimeoutTimestamp(
            math.max(maxTs + ttl, state.getCurrentWatermarkMs + 1))
      }
      out.result().iterator
    }
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[AsOfEvent](Encoders.product[AsOfEvent])
      .groupByKey(_.k)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(update)
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

  /** Stream-stream 1-D interval overlap join — the time-range analog of
    * [[streamSpatialJoin]]: the fixed-width cell decomposition of
    * `operators.IntervalJoin` supplies the equi key Structured Streaming
    * needs for state partitioning, and `timeCond` (an event-time range
    * over the two sides' WATERMARKED timestamp columns, e.g.
    * `lts BETWEEN rts - INTERVAL 7 HOURS AND rts + INTERVAL 7 HOURS`)
    * bounds the join state. `timeCond` is ANDed into the join condition,
    * so it must be implied by interval overlap — pick the band from the
    * maximum interval length on each side (overlap of closed intervals
    * with lengths <= La/Lb implies lStart - rStart in [-Lb, La]); rows
    * with longer intervals would silently lose matches, so bound your
    * interval lengths upstream.
    *
    * Start/end columns are integral (e.g. epoch micros); `cellWidth` is
    * the usual fanout knob (~ typical interval length). Inverted
    * intervals match nothing; pairs emit exactly once (reference-cell
    * dedup). Both inputs MUST carry `withWatermark` on the columns
    * `timeCond` references. */
  def streamRangeJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      timeCond: Column, cellWidth: Long, origin: Long = 0L): DataFrame =
    graft.operators.IntervalJoin.overlapJoin(left, right,
      lStart, lEnd, rStart, rEnd, key = None,
      cellWidth = cellWidth, origin = origin, extraCond = Some(timeCond))

  case class BucketDoc(bucket: String, band: Int, doc_id: Long, ts_ms: Long)
  case class BucketFlag(doc_id: Long, band: Int, is_dup: Boolean)

  /** Streaming MinHash near-dup dedup — the fuzzy analog of the exact
    * content-hash dedup stream: each document explodes to its LSH band
    * buckets (map-only sketch kernels, the same bits as
    * `PipelineOps.minhashPairs`), and a bucket-keyed
    * `flatMapGroupsWithState` holds the MINIMUM doc id ever seen per
    * bucket — O(buckets) state, one long each, never a document body.
    * A document is flagged in a bucket when a lower-id document already
    * occupies it (first-seen-by-id survivor — a total order the oracle
    * can restate, batch-split-invariant because the held minimum is).
    *
    * Emits bucket-level flags (doc_id, band, is_dup); the per-doc
    * verdict is ANY over its bands — a stateless rollup of the sink
    * (Structured Streaming does not admit an aggregation downstream of
    * flatMapGroupsWithState in one query).
    *
    * State bound: without a TTL the bucket set grows with the corpus.
    * Passing `eventTimeMs` (epoch-millis column) + `idleTtlMs` switches
    * to event-time timeouts: a bucket idle longer than the TTL (by
    * watermark) drops its held minimum. Result-neutrality: every flag
    * for a doc arriving within `idleTtlMs` of its bucket's last activity
    * is IDENTICAL to the unbounded run; only docs past the idle horizon
    * lose matches against pre-horizon minima — the deliberate
    * windowed-dedup contract, same as the as-of join's idle TTL.
    * Out-of-order tolerance: the watermark delay equals the TTL itself,
    * so a row up to `idleTtlMs` behind the max event time seen is still
    * processed (not silently dropped pre-state); rows later than that
    * are outside the idle horizon by definition and are dropped by the
    * watermark, consistent with the contract above. */
  def streamMinhashDedup(docs: DataFrame, id: Column, text: Column,
      numHashes: Int = 12, bands: Int = 4, shingleK: Int = 3,
      eventTimeMs: Option[Column] = None,
      idleTtlMs: Option[Long] = None): DataFrame = {
    import graft.pipeline.TextOps
    import org.apache.spark.sql.functions._
    require(idleTtlMs.isEmpty || eventTimeMs.isDefined,
      "idleTtlMs requires an eventTimeMs column to watermark on")
    val r = numHashes / bands
    val exploded0 = docs.select(id.as("doc_id"),
        eventTimeMs.getOrElse(lit(0L)).cast("long").as("ts_ms"),
        posexplode(TextOps.bandKeys(
          TextOps.minhashSignatureTok(TextOps.tokens(text), shingleK, numHashes),
          bands, r)))
      .select(concat(col("pos").cast("string"), lit(":"), col("col")).as("bucket"),
        col("pos").as("band"), col("doc_id"), col("ts_ms"))
    val exploded =
      (if (idleTtlMs.isDefined)
        // watermark delay = the TTL: a row within the idle horizon of the
        // max event time is never dropped pre-state (a 0s delay would
        // silently drop ANY out-of-order row before flatMapGroupsWithState)
        exploded0.withColumn("ts", timestamp_millis(col("ts_ms")))
          .withWatermark("ts", s"${idleTtlMs.get} milliseconds")
      else exploded0).as[BucketDoc](Encoders.product[BucketDoc])
    implicit val bf = Encoders.product[BucketFlag]
    implicit val le = Encoders.scalaLong
    def update(bucket: String, batch: Iterator[BucketDoc],
        state: GroupState[Long]): Iterator[BucketFlag] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val ds = batch.toSeq.sortBy(_.doc_id)
      var minSeen: Long = state.getOption.getOrElse(Long.MaxValue)
      var maxTs = Long.MinValue
      val out = ds.map { d =>
        if (d.ts_ms > maxTs) maxTs = d.ts_ms
        val f = BucketFlag(d.doc_id, d.band,
          minSeen != Long.MaxValue && d.doc_id > minSeen)
        if (d.doc_id < minSeen) minSeen = d.doc_id
        f
      }
      if (minSeen != Long.MaxValue) state.update(minSeen)
      idleTtlMs.foreach { ttl =>
        if (state.exists)
          // must exceed the current watermark or Spark rejects it (the
          // same lagging-key guard as the as-of idle TTL)
          state.setTimeoutTimestamp(
            math.max(maxTs + ttl, state.getCurrentWatermarkMs + 1))
      }
      out.iterator
    }
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    exploded.groupByKey(_.bucket)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(update)
      .toDF()
  }
}
