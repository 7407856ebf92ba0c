package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{JoinedRow, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global ranking without the single-reducer sort.
  *
  * `Window.orderBy(...)` with no `partitionBy` collapses the whole dataset
  * into ONE task — the canonical Spark scale cliff (fine at 600k rows,
  * dead at 100 TB). These operators compute the same global ranks with a
  * range repartition (parallel sort, the same machinery as `df.orderBy`)
  * plus a per-partition count pass: partition i's exclusive prefix sum of
  * counts + the local row index IS the global row number.
  *
  * The count job and the rank job run over the SAME RDD lineage, so the
  * range-exchange map output is written once and the second job only
  * replays the post-shuffle stage (Spark core shuffle reuse) — partition
  * boundaries are identical by construction, no caching required. This is
  * `RDD.zipWithIndex`'s scheme, kept in InternalRow form so the result
  * re-enters DataFrame land without an encoder round-trip.
  *
  * Ties on `orderCols` land in the same partition (range partitioner) and
  * get arbitrary relative order — identical semantics to the built-in
  * window `row_number`/`ntile` under a non-total ordering. Callers should
  * `select` down to order + payload columns first; the shuffle carries
  * whatever width you pass in.
  */
object ScalableRank {

  /** df plus `out` = 1-based global row number by `orderCols` (ascending). */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame =
    withGlobalRn(df, orderCols, out, numPartitions)._1

  /** df plus `out` = ntile(n) by `orderCols` — built-in tile semantics
    * (first `N mod n` tiles get the extra row). */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], n: Int, out: String,
      numPartitions: Int = 0): DataFrame = {
    require(n > 0, "ntile requires n > 0")
    val (rn, total) = withGlobalRn(df, orderCols, "__grn", numPartitions)
    val q = total / n
    val r = total % n
    val idx0 = col("__grn") - 1
    val tile =
      if (q == 0) idx0.cast("int") + 1
      else (when(idx0 < lit(r * (q + 1)), (idx0 / lit(q + 1)).cast("long"))
        .otherwise(lit(r) + ((idx0 - lit(r * (q + 1))) / lit(q)).cast("long"))
        .cast("int") + 1)
    rn.withColumn(out, tile).drop("__grn")
  }

  /** Per-tile (count, double-sum of `valueCol`) with built-in ntile
    * boundary semantics (first `N mod n` tiles one row larger), WITHOUT
    * materializing per-row tile ids: the same two-job range scheme as
    * [[globalRowNumber]], but job 2 walks each sorted partition with its
    * global offset and accumulates into at most n local buckets,
    * emitting ≤ n rows per partition — so the per-row UnsafeProjection
    * of 600k+ ranked rows and the row-wide groupBy(tile) exchange both
    * disappear from the plan (opt r18, guide §2.3/§2.4: aggregate before
    * you shuffle; the exchange now carries ≤ n·partitions tiny rows).
    * Returns (tile INT, n LONG, sum_val DOUBLE). */
  def globalNtileAgg(df: DataFrame, orderCols: Seq[Column], n: Int,
      valueCol: String, numPartitions: Int = 0): DataFrame = {
    require(n > 0, "ntile requires n > 0")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val vType = sorted.schema(vIdx).dataType
    require(vType == org.apache.spark.sql.types.DoubleType,
      s"globalNtileAgg: $valueCol must be DoubleType (cast first)")
    val rdd = sorted.queryExecution.toRdd
    val counts = rdd.mapPartitions(it => Iterator.single(it.size.toLong),
      preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val q = total / n
    val r = total % n
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tile",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__n",
        LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__sv",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val types = outSchema.fields.map(_.dataType)
    val tiled = rdd.mapPartitionsWithIndex { (pid, it) =>
      val cnt = new Array[Long](n)
      val sum = new Array[Double](n)
      var g = offsets(pid)
      while (it.hasNext) {
        val row = it.next()
        // 0-based tile of global index g — the built-in ntile split
        val t =
          if (q == 0) g.toInt
          else if (g < r * (q + 1)) (g / (q + 1)).toInt
          else (r + (g - r * (q + 1)) / q).toInt
        cnt(t) += 1
        sum(t) += row.getDouble(vIdx)
        g += 1
      }
      val proj = UnsafeProjection.create(types)
      val out = new SpecificInternalRow(types.toIndexedSeq)
      (0 until n).iterator.filter(cnt(_) > 0).map { t =>
        out.setInt(0, t + 1)
        out.setLong(1, cnt(t))
        out.setDouble(2, sum(t))
        proj(out): InternalRow
      }
    }
    org.apache.spark.sql.graft.DatasetBridge
      .internalDf(spark, tiled, outSchema)
      .groupBy(col("tile"))
      .agg(sum(col("__n")).as("n"), sum(col("__sv")).as("sum_val"))
  }

  /** df plus `out` = EXCLUSIVE global prefix sum of `valueCol` (a LongType
    * column of df) by `orderCols`: each row gets the sum of all earlier
    * rows' values. Same two-job scheme as globalRowNumber — job 1 sums
    * per partition, job 2 replays the post-shuffle stage carrying the
    * partition's offset and a running local sum. The single-reducer
    * `SUM OVER (ORDER BY ...)` window this replaces is the canonical
    * scale cliff for running totals. */
  def globalPrefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
      out: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"globalPrefixSum: $valueCol must be LongType (cast first)")
    val rdd = sorted.queryExecution.toRdd
    val sums = rdd.mapPartitions({ it =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator.single(s)
    }, preservesPartitioning = true).collect()
    val offsets = sums.scanLeft(0L)(_ + _)
    val outSchema = sorted.schema.add(out, LongType, nullable = false)
    val types = outSchema.fields.map(_.dataType)
    val zipped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(types)
      val joined = new JoinedRow
      val sumRow = new SpecificInternalRow(Seq(LongType))
      var running = offsets(pid)
      it.map { row =>
        sumRow.setLong(0, running)
        running += row.getLong(vIdx)
        proj(joined(row, sumRow)): InternalRow
      }
    }
    org.apache.spark.sql.graft.DatasetBridge.internalDf(spark, zipped, outSchema)
  }

  /** Shared plumbing: (df + 1-based global row number `out`, total rows). */
  private def withGlobalRn(df: DataFrame, orderCols: Seq[Column], out: String,
      numPartitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val rdd = sorted.queryExecution.toRdd
    // job 1: per-partition sizes (map side of the range exchange runs here
    // and its output is reused by job 2)
    val counts = rdd.mapPartitions(it => Iterator.single(it.size.toLong),
      preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val outSchema = sorted.schema.add(out, LongType, nullable = false)
    val types = outSchema.fields.map(_.dataType)
    // job 2 (runs as part of whatever action consumes the result): append
    // offset+localIndex per row, streaming — no buffering, rows projected
    // to UnsafeRow immediately so upstream row reuse is safe
    val zipped = rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(types)
      val joined = new JoinedRow
      val idxRow = new SpecificInternalRow(Seq(LongType))
      var i = offsets(pid)
      it.map { row =>
        i += 1
        idxRow.setLong(0, i)
        proj(joined(row, idxRow)): InternalRow
      }
    }
    (org.apache.spark.sql.graft.DatasetBridge.internalDf(spark, zipped, outSchema), total)
  }
}
