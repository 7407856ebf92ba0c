package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Envelope, Geometry, LineString, Point, Polygon}
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.collection.mutable.ArrayBuffer
import graft.geom.GeomIO

/** Spatial aggregates (SURVEY.md §2.6). Same partial/merge/final contract as
  * the reference's DataFusion accumulators (st_envelope_agg.rs:50-231,
  * st_collect_agg.rs:49-238, sedona-geo st_union_agg.rs) — Spark runs the
  * partial on the map side, so only small intermediate buffers shuffle.
  */
object GeomAggBase {
  def writeGeoms(gs: Seq[Geometry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(gs.length)
    gs.foreach { g => val b = GeomIO.write(g); out.writeInt(b.length); out.write(b) }
    out.flush(); bos.toByteArray
  }
  def readGeoms(bytes: Array[Byte]): ArrayBuffer[Geometry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Geometry](n)
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf += GeomIO.read(b); i += 1
    }
    buf
  }
}

abstract class GeomListAgg extends TypedImperativeAggregate[ArrayBuffer[Geometry]] {
  def child: Expression
  /** Compact the buffer when it grows past this (keeps memory bounded for
    * 100TB-scale groups; union/hull folds are associative). */
  protected def compactAt: Int = 512
  protected def compact(buf: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = buf

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def createAggregationBuffer(): ArrayBuffer[Geometry] = new ArrayBuffer[Geometry]()
  override def update(buf: ArrayBuffer[Geometry], input: InternalRow): ArrayBuffer[Geometry] = {
    val v = child.eval(input)
    if (v != null) {
      buf += GeomIO.read(v.asInstanceOf[Array[Byte]])
      if (buf.length >= compactAt) compact(buf) else buf
    } else buf
  }
  override def merge(buf: ArrayBuffer[Geometry], other: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    buf ++= other
    if (buf.length >= compactAt) compact(buf) else buf
  }
  override def serialize(buf: ArrayBuffer[Geometry]): Array[Byte] =
    GeomAggBase.writeGeoms(compact(buf).toSeq)
  override def deserialize(storage: Array[Byte]): ArrayBuffer[Geometry] =
    GeomAggBase.readGeoms(storage)
}

/** ST_Envelope_Agg — fixed 4-double buffer (st_envelope_agg.rs:50). */
case class StEnvelopeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Envelope] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_envelope_agg"
  override def createAggregationBuffer(): Envelope = new Envelope()
  override def update(b: Envelope, input: InternalRow): Envelope = {
    val v = child.eval(input)
    if (v != null)
      b.expandToInclude(GeomIO.read(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal)
    b
  }
  override def merge(b: Envelope, o: Envelope): Envelope = { b.expandToInclude(o); b }
  override def eval(b: Envelope): Any =
    if (b.isNull) null else GeomIO.write(GeomIO.factory.toGeometry(b))
  override def serialize(b: Envelope): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32)
    if (b.isNull) bb.putDouble(1).putDouble(0).putDouble(1).putDouble(0)
    else bb.putDouble(b.getMinX).putDouble(b.getMaxX).putDouble(b.getMinY).putDouble(b.getMaxY)
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Envelope = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val (minX, maxX, minY, maxY) = (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
    if (minX > maxX) new Envelope() else new Envelope(minX, maxX, minY, maxY)
  }
  override def withNewMutableAggBufferOffset(o: Int): StEnvelopeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StEnvelopeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_Union_Agg — incremental cascaded union (sedona-geo st_union_agg.rs). */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomListAgg {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_union_agg"
  override protected def compact(buf: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    if (buf.length > 1) {
      val u = UnaryUnionOp.union(GeomIO.factory.buildGeometry(
        scala.jdk.CollectionConverters.SeqHasAsJava(buf.toSeq).asJava))
      buf.clear(); buf += u
    }
    buf
  }
  override def eval(buf: ArrayBuffer[Geometry]): Any = {
    if (buf.isEmpty) null
    else GeomIO.write(compact(buf).head)
  }
  override def withNewMutableAggBufferOffset(o: Int): StUnionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StUnionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_Intersection_Agg (sedona-geo st_intersection_agg.rs). */
case class StIntersectionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomListAgg {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_intersection_agg"
  override protected def compactAt: Int = 2
  override protected def compact(buf: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    if (buf.length > 1) {
      val r = buf.reduceLeft(_.intersection(_))
      buf.clear(); buf += r
    }
    buf
  }
  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null else GeomIO.write(compact(buf).head)
  override def withNewMutableAggBufferOffset(o: Int): StIntersectionAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StIntersectionAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_Collect_Agg — into MultiX/GeometryCollection (st_collect_agg.rs:49). */
case class StCollectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomListAgg {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_collect_agg"
  override protected def compactAt: Int = Int.MaxValue
  override def eval(buf: ArrayBuffer[Geometry]): Any = {
    if (buf.isEmpty) return null
    // deterministic result independent of partition arrival order
    val gs = buf.sortBy(g => java.util.Arrays.hashCode(GeomIO.write(g)))
    val out =
      if (gs.forall(_.isInstanceOf[Point]))
        GeomIO.factory.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
      else if (gs.forall(_.isInstanceOf[LineString]))
        GeomIO.factory.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
      else if (gs.forall(_.isInstanceOf[Polygon]))
        GeomIO.factory.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
      else GeomIO.factory.createGeometryCollection(gs.toArray)
    GeomIO.write(out)
  }
  override def withNewMutableAggBufferOffset(o: Int): StCollectAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StCollectAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_ConvexHull_Agg (sedona-geo st_convexhull_agg.rs). */
case class StConvexHullAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomListAgg {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_convexhull_agg"
  override protected def compact(buf: ArrayBuffer[Geometry]): ArrayBuffer[Geometry] = {
    if (buf.length > 1) {
      val hull = GeomIO.factory.buildGeometry(
        scala.jdk.CollectionConverters.SeqHasAsJava(buf.toSeq).asJava).convexHull()
      buf.clear(); buf += hull
    }
    buf
  }
  override def eval(buf: ArrayBuffer[Geometry]): Any =
    if (buf.isEmpty) null else GeomIO.write(compact(buf).head)
  override def withNewMutableAggBufferOffset(o: Int): StConvexHullAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StConvexHullAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_Analyze_Agg — column statistics struct (st_analyze_agg.rs:53-77,
  * GeoStatistics rust/sedona-expr/src/statistics.rs:37-190). */
case class StAnalyzeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StAnalyzeAgg.Buf] {
  import StAnalyzeAgg.Buf
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "st_analyze_agg"
  override def dataType: DataType = StructType(Seq(
    StructField("count", LongType), StructField("total_points", LongType),
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType),
    StructField("total_area", DoubleType), StructField("total_length", DoubleType)))
  override def createAggregationBuffer(): Buf = new Buf()
  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val g = GeomIO.read(v.asInstanceOf[Array[Byte]])
      b.count += 1; b.points += g.getNumPoints
      b.area += g.getArea; b.length += g.getLength
      b.env.expandToInclude(g.getEnvelopeInternal)
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    b.count += o.count; b.points += o.points; b.area += o.area; b.length += o.length
    b.env.expandToInclude(o.env); b
  }
  override def eval(b: Buf): Any = {
    if (b.count == 0) null
    else new GenericInternalRow(Array[Any](b.count, b.points,
      b.env.getMinX, b.env.getMinY, b.env.getMaxX, b.env.getMaxY, b.area, b.length))
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * 8)
    bb.putLong(b.count).putLong(b.points).putDouble(b.area).putDouble(b.length)
    if (b.env.isNull) bb.putDouble(1).putDouble(0).putDouble(1).putDouble(0)
    else bb.putDouble(b.env.getMinX).putDouble(b.env.getMaxX)
      .putDouble(b.env.getMinY).putDouble(b.env.getMaxY)
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val b = new Buf()
    b.count = bb.getLong; b.points = bb.getLong; b.area = bb.getDouble; b.length = bb.getDouble
    val (minX, maxX, minY, maxY) = (bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
    if (minX <= maxX) b.env = new Envelope(minX, maxX, minY, maxY)
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): StAnalyzeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StAnalyzeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ST_Polygonize_Agg — collected edges -> Polygonizer
  * (c/sedona-geos/src/st_polygonize_agg.rs). */
case class StPolygonizeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends GeomListAgg {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_polygonize_agg"
  override protected def compactAt: Int = Int.MaxValue
  override def eval(buf: ArrayBuffer[Geometry]): Any = {
    if (buf.isEmpty) return null
    val p = new org.locationtech.jts.operation.polygonize.Polygonizer()
    buf.sortBy(g => java.util.Arrays.hashCode(GeomIO.write(g))).foreach(p.add)
    GeomIO.write(GeomIO.factory.buildGeometry(p.getPolygons))
  }
  override def withNewMutableAggBufferOffset(o: Int): StPolygonizeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StPolygonizeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object StAnalyzeAgg {
  class Buf {
    var count: Long = 0L
    var points: Long = 0L
    var area: Double = 0.0
    var length: Double = 0.0
    var env: Envelope = new Envelope()
  }
}

object StEnvelopeSphereAgg {
  /** Wrap-aware buffer: chart lon segments (merged on overflow) + lat
    * range. Bounded: segments merge to at most the distinct gaps. */
  class Buf {
    var segs: ArrayBuffer[(Double, Double)] = new ArrayBuffer[(Double, Double)]()
    var latMin: Double = Double.MaxValue
    var latMax: Double = -Double.MaxValue
    def add(lo: Double, hi: Double): Unit = {
      if (lo <= hi) segs += ((lo, hi))
      else { segs += ((lo, 180.0)); segs += ((-180.0, hi)) } // wrapped
      if (segs.length > 64) compact()
    }
    def compact(): Unit = {
      val sorted = segs.sortBy(_._1)
      val merged = new ArrayBuffer[(Double, Double)]()
      sorted.foreach { case (s, e) =>
        if (merged.nonEmpty && s <= merged.last._2) {
          val (ps, pe) = merged.last
          merged(merged.length - 1) = (ps, math.max(pe, e))
        } else merged += ((s, e))
      }
      segs = merged
    }
  }
}

/** ST_EnvelopeSphere_Agg — the geography envelope aggregate: each input's
  * wrap-aware lng/lat rect (short-arc cover) feeds a circular segment
  * union, and the final rect is the complement of the largest lon gap —
  * so a group straddling the antimeridian aggregates to a wrapped rect
  * (MULTIPOLYGON split at ±180), not a [-180, 180] chart blowup. The
  * geography analog of the reference's st_envelope_agg.rs accumulator. */
case class StEnvelopeSphereAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StEnvelopeSphereAgg.Buf] {
  import StEnvelopeSphereAgg.Buf
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_envelopesphere_agg"
  override def createAggregationBuffer(): Buf = new Buf
  override def update(b: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      Spherical.lngLatRect(GeomIO.read(v.asInstanceOf[Array[Byte]])).foreach {
        case (lo, latLo, hi, latHi) =>
          b.add(lo, hi)
          b.latMin = math.min(b.latMin, latLo)
          b.latMax = math.max(b.latMax, latHi)
      }
    }
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    o.segs.foreach { case (lo, hi) => b.add(lo, hi) }
    b.latMin = math.min(b.latMin, o.latMin)
    b.latMax = math.max(b.latMax, o.latMax)
    b
  }
  override def eval(b: Buf): Any =
    Spherical.coverInterval(b.segs.toSeq) match {
      case None => null
      case Some((lo, hi)) =>
        GeomIO.write(Spherical.rectGeometry(lo, b.latMin, hi, b.latMax))
    }
  override def serialize(b: Buf): Array[Byte] = {
    b.compact()
    val bb = java.nio.ByteBuffer.allocate(4 + b.segs.length * 16 + 16)
    bb.putInt(b.segs.length)
    b.segs.foreach { case (lo, hi) => bb.putDouble(lo).putDouble(hi) }
    bb.putDouble(b.latMin).putDouble(b.latMax)
    bb.array()
  }
  override def deserialize(s: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(s)
    val b = new Buf
    val n = bb.getInt
    (0 until n).foreach(_ => b.segs += ((bb.getDouble, bb.getDouble)))
    b.latMin = bb.getDouble
    b.latMax = bb.getDouble
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): StEnvelopeSphereAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): StEnvelopeSphereAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
