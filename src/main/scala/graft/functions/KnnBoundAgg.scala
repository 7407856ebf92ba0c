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
