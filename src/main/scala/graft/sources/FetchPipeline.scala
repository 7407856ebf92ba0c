package graft.sources

/** One-ahead pipelined range reads for windowed raster decodes.
  *
  * The windowed loaders are byte-optimal (fetched bytes == window bytes,
  * asserted by RasterWindowSpec) but SERIAL per load: fetch range i,
  * decode it, fetch range i+1. On the 100 TB path the store fetch and
  * the decode are comparable costs, so pipelining them — fetch of range
  * i+1 in flight while range i converts — takes the load's wall time
  * toward max(fetch, decode) instead of their sum.
  *
  * Bounds and safety:
  *   - exactly ONE range is in flight ahead of the consumer, so extra
  *     memory is bounded by one chunk and the byte counters still equal
  *     the window size (each range fetched exactly once);
  *   - the underlying stream is touched by at most one thread at a time
  *     (the next submit happens only after the previous get), so a
  *     non-thread-safe positional reader stays safe;
  *   - on a consumer failure the in-flight fetch is drained before the
  *     exception propagates, so the caller can close the stream.
  */
object FetchPipeline {

  /** Shared daemon pool: prefetch tasks are short-lived IO waits; a
    * cached pool sizes itself to the number of concurrently-loading
    * tasks (bounded by the executor's task slots). */
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-raster-prefetch")
      t.setDaemon(true)
      t
    })

  /** Chunk size for splitting one large coalesced range into pipeline
    * stages (netCDF full-width band fetches). */
  val ChunkBytes: Int = 4 << 20

  /** Fetch each `(offset, length)` job through `fetch` with one-ahead
    * lookahead and hand the bytes to `consume(jobIndex, bytes)` in job
    * order. Single-job lists stay on the caller thread (no pool cost). */
  def run(fetch: (Long, Int) => Array[Byte], jobs: IndexedSeq[(Long, Int)])(
      consume: (Int, Array[Byte]) => Unit): Unit = {
    if (jobs.isEmpty) return
    if (jobs.length == 1) {
      consume(0, fetch(jobs(0)._1, jobs(0)._2))
      return
    }
    def submit(i: Int): java.util.concurrent.Future[Array[Byte]] =
      pool.submit(() => fetch(jobs(i)._1, jobs(i)._2))
    var pending = submit(0)
    var i = 0
    try {
      while (i < jobs.length) {
        val bytes =
          try pending.get()
          catch {
            case e: java.util.concurrent.ExecutionException => throw e.getCause
          }
        i += 1
        if (i < jobs.length) pending = submit(i)
        consume(i - 1, bytes)
      }
    } finally {
      // a consume failure mid-loop leaves a fetch in flight against a
      // stream the caller is about to close — drain it first
      if (i < jobs.length) {
        try pending.get()
        catch { case _: Throwable => () }
      }
    }
  }
}
