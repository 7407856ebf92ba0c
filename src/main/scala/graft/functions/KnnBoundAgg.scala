package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

object SdKnnBoundAgg {
  /** Exact distinct-`oid` top-k by (d, tb, oid) lexicographic order,
    * bounded at k entries — the per-query state of the KNN grid joins'
    * round-1 bound. k is small (a user's KNN k), so linear scans beat
    * heap bookkeeping. */
  final class Buf(val k: Int) {
    val ds = new Array[Double](k)
    val tbs = new Array[Double](k)
    val oids = new Array[Long](k)
    var n = 0
    private def lt(d1: Double, t1: Double, o1: Long,
        d2: Double, t2: Double, o2: Long): Boolean =
      d1 < d2 || (d1 == d2 && (t1 < t2 || (t1 == t2 && o1 < o2)))
    private def maxIdx: Int = {
      var m = 0; var i = 1
      while (i < n) {
        if (lt(ds(m), tbs(m), oids(m), ds(i), tbs(i), oids(i))) m = i
        i += 1
      }
      m
    }
    def insert(d: Double, tb: Double, oid: Long): Unit = {
      var i = 0
      while (i < n) { // distinct-oid: keep the smaller (d, tb) per oid
        if (oids(i) == oid) {
          if (lt(d, tb, oid, ds(i), tbs(i), oids(i))) { ds(i) = d; tbs(i) = tb }
          return
        }
        i += 1
      }
      if (n < k) { ds(n) = d; tbs(n) = tb; oids(n) = oid; n += 1 }
      else {
        val m = maxIdx
        if (lt(d, tb, oid, ds(m), tbs(m), oids(m))) {
          ds(m) = d; tbs(m) = tb; oids(m) = oid
        }
      }
    }
    /** kth smallest distance currently held (max over the ≤k kept). */
    def dk: Double = {
      val m = maxIdx
      ds(m)
    }
  }
}

/** sd_knn_bound_agg(d, tb, oid, k) -> struct(dk double, cnt int): the
  * exact kth-smallest distinct-oid candidate distance and the distinct
  * candidate count (capped at k), under (d, tb, oid) tie ordering — the
  * per-query round-1 bound of the out-of-core KNN grid joins. As a
  * TypedImperativeAggregate it PARTIALLY AGGREGATES map-side, so the
  * probe join's candidate pairs are consumed where they are produced:
  * nothing but (qid, k-entry buffer) rows ever shuffle, where the former
  * dropDuplicates + row_number window pipeline shuffled every candidate
  * pair twice. At 100 TB the probe join's pair count is the dominant
  * intermediate — this keeps it out of the exchange entirely. */
object SdKnnWeightedBoundAgg {
  /** Weighted kth-smallest upper-bound state: the k smallest (ub,
    * weight) entries plus a saturating total weight. Each entry's
    * weight is >= 1, so the k smallest entries always contain the
    * weighted kth when the total reaches k. */
  final class Buf(val k: Int) {
    val ubs = new Array[Double](k)
    val wts = new Array[Long](k)
    var n = 0
    var total = 0L
    private def maxIdx: Int = {
      var m = 0; var i = 1
      while (i < n) { if (ubs(i) > ubs(m)) m = i; i += 1 }
      m
    }
    def insert(ub: Double, wt: Long): Unit = {
      if (wt <= 0) return
      total = math.min(Long.MaxValue / 2, total + wt)
      if (n < k) { ubs(n) = ub; wts(n) = wt; n += 1 }
      else {
        val m = maxIdx
        if (ub < ubs(m)) { ubs(m) = ub; wts(m) = wt }
      }
    }
    /** Smallest kept ub whose cumulative weight reaches k (the kept max
      * when the total is still short of k). */
    def rk: Double = {
      val order = (0 until n).sortBy(i => ubs(i))
      var cum = 0L
      var i = 0
      while (i < order.length) {
        cum += wts(order(i))
        if (cum >= k) return ubs(order(i))
        i += 1
      }
      ubs(order.last)
    }
  }
}

/** sd_knn_wbound_agg(ub, weight, k) -> struct(rk double, cnt int): the
  * weighted kth-smallest upper bound and min(total weight, k). The
  * COUNT-PROBE form of the KNN round-1 bound: inputs are (cell upper
  * bound, cell object count) pairs from a broadcast per-cell histogram,
  * never object rows — with >= k objects at cell upper bounds <= rk,
  * the true kth distance is <= rk, and the single exact join that
  * follows probes radius rk instead of enumerating an escalation
  * cover's full object population. */
case class SdKnnWeightedBoundAgg(
    ub: Expression, wt: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SdKnnWeightedBoundAgg.Buf] {
  import SdKnnWeightedBoundAgg.Buf

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(ub, wt, kExpr)
  override def nullable: Boolean = true
  override def prettyName: String = "sd_knn_wbound_agg"
  override def dataType: DataType = StructType(Seq(
    StructField("rk", DoubleType), StructField("cnt", IntegerType)))
  override def createAggregationBuffer(): Buf = {
    require(k >= 1 && k <= 65536, s"sd_knn_wbound_agg: k out of range: $k")
    new Buf(k)
  }
  override def update(b: Buf, input: InternalRow): Buf = {
    val u = ub.eval(input)
    val w = wt.eval(input)
    if (u != null && w != null)
      b.insert(u.asInstanceOf[Double], w.asInstanceOf[Number].longValue())
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n) { b.insert(o.ubs(i), o.wts(i)); i += 1 }
    // kept entries re-add their weights inside insert; correct the total
    // to reflect BOTH sides' full totals, not just the kept entries
    var keptO = 0L
    i = 0
    while (i < o.n) { keptO += o.wts(i); i += 1 }
    b.total = math.min(Long.MaxValue / 2, b.total + (o.total - keptO))
    b
  }
  override def eval(b: Buf): Any =
    if (b.n == 0) null
    else new GenericInternalRow(Array[Any](b.rk, math.min(b.total, k.toLong).toInt))
  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n).putLong(b.total)
    var i = 0
    while (i < b.n) { bb.putDouble(b.ubs(i)).putLong(b.wts(i)); i += 1 }
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val b = new Buf(bb.getInt)
    val n = bb.getInt
    b.total = bb.getLong
    var i = 0
    while (i < n) { b.ubs(i) = bb.getDouble; b.wts(i) = bb.getLong; i += 1 }
    b.n = n
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): SdKnnWeightedBoundAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SdKnnWeightedBoundAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ub = c(0), wt = c(1), kExpr = c(2))
}

/** sd_knn_topk_agg(d, tb, oid, k) -> array<struct<oid, d, rank>>: the
  * exact distinct-oid top-k candidates per group under (d, tb, oid) tie
  * ordering, rank assigned 1..n in that order. The FINAL phase of the
  * out-of-core KNN grid joins: candidate pairs are consumed map-side
  * where the probe join produces them and only (qid, <=k entries)
  * buffers shuffle — the former dropDuplicates + row_number window
  * pipeline shuffled every surviving pair twice (and its narrow
  * post-shuffle rows invited an AQE coalesce into near-single-threaded
  * sorts: measured 50s of a 53s m=10 sparse run). Winner rows rejoin
  * the persisted inputs by id afterwards. */
case class SdKnnTopKAgg(
    d: Expression, tb: Expression, oid: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SdKnnBoundAgg.Buf] {
  import SdKnnBoundAgg.Buf

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(d, tb, oid, kExpr)
  override def nullable: Boolean = true
  override def prettyName: String = "sd_knn_topk_agg"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("oid", LongType), StructField("d", DoubleType),
    StructField("rank", IntegerType))), containsNull = false)
  override def createAggregationBuffer(): Buf = {
    require(k >= 1 && k <= 65536, s"sd_knn_topk_agg: k out of range: $k")
    new Buf(k)
  }
  override def update(b: Buf, input: InternalRow): Buf = {
    val dv = d.eval(input)
    val ov = oid.eval(input)
    if (dv != null && ov != null) {
      val tv = tb.eval(input)
      b.insert(dv.asInstanceOf[Double],
        if (tv == null) 0.0 else tv.asInstanceOf[Double],
        ov.asInstanceOf[Long])
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n) { b.insert(o.ds(i), o.tbs(i), o.oids(i)); i += 1 }
    b
  }
  override def eval(b: Buf): Any = {
    if (b.n == 0) return null
    val order = (0 until b.n).sortBy(i => (b.ds(i), b.tbs(i), b.oids(i)))
    val out = new Array[Any](b.n)
    var r = 0
    while (r < b.n) {
      val i = order(r)
      out(r) = new GenericInternalRow(Array[Any](b.oids(i), b.ds(i), r + 1))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putDouble(b.ds(i)).putDouble(b.tbs(i)).putLong(b.oids(i))
      i += 1
    }
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val b = new Buf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      b.ds(i) = bb.getDouble; b.tbs(i) = bb.getDouble; b.oids(i) = bb.getLong
      i += 1
    }
    b.n = n
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): SdKnnTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SdKnnTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(d = c(0), tb = c(1), oid = c(2), kExpr = c(3))
}

case class SdKnnBoundAgg(
    d: Expression, tb: Expression, oid: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SdKnnBoundAgg.Buf] {
  import SdKnnBoundAgg.Buf

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(d, tb, oid, kExpr)
  override def nullable: Boolean = true
  override def prettyName: String = "sd_knn_bound_agg"
  override def dataType: DataType = StructType(Seq(
    StructField("dk", DoubleType), StructField("cnt", IntegerType)))
  override def createAggregationBuffer(): Buf = {
    require(k >= 1 && k <= 65536, s"sd_knn_bound_agg: k out of range: $k")
    new Buf(k)
  }
  override def update(b: Buf, input: InternalRow): Buf = {
    val dv = d.eval(input)
    val ov = oid.eval(input)
    if (dv != null && ov != null) {
      val tv = tb.eval(input)
      b.insert(dv.asInstanceOf[Double],
        if (tv == null) 0.0 else tv.asInstanceOf[Double],
        ov.asInstanceOf[Long])
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.n) { b.insert(o.ds(i), o.tbs(i), o.oids(i)); i += 1 }
    b
  }
  override def eval(b: Buf): Any =
    if (b.n == 0) null
    else new GenericInternalRow(Array[Any](b.dk, b.n))
  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putDouble(b.ds(i)).putDouble(b.tbs(i)).putLong(b.oids(i))
      i += 1
    }
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val b = new Buf(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      b.ds(i) = bb.getDouble; b.tbs(i) = bb.getDouble; b.oids(i) = bb.getLong
      i += 1
    }
    b.n = n
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): SdKnnBoundAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SdKnnBoundAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(d = c(0), tb = c(1), oid = c(2), kExpr = c(3))
}
