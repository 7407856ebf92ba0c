package graft.functions

import org.locationtech.jts.geom.Geometry

/** Spatial sort keys (reference: SD_Order Hilbert clustering,
  * rust/sedona-functions/src/sd_order.rs; used for `ORDER BY` spatial
  * clustering so adjacent rows land in the same parquet row groups — the
  * scale lever behind bbox-covering pruning).
  *
  * Both curves map a geometry's envelope center into a 2^16 x 2^16 grid
  * over caller-supplied bounds. `morton` (Z-order) is additionally
  * SQL-expressible, which the DuckDB oracle uses to cross-check.
  */
object SpaceCurve {
  private final val Order = 16
  private final val Cells = 1 << Order // 65536

  @inline private def scale(v: Double, lo: Double, hi: Double): Int = {
    if (hi <= lo) 0
    else {
      val t = (v - lo) / (hi - lo)
      val s = (t * Cells).toInt
      if (s < 0) 0 else if (s >= Cells) Cells - 1 else s
    }
  }

  /** Hilbert curve distance of cell (x, y), order 16 — the classic
    * rot/swap formulation. */
  def hilbertIndex(xIn: Int, yIn: Int): Long = {
    var rx = 0; var ry = 0
    var x = xIn; var y = yIn
    var d = 0L
    var s = Cells / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1 else 0
      ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Morton (Z-order) index: interleave 16-bit x (even bits) and y (odd). */
  def mortonIndex(x: Int, y: Int): Long = {
    var d = 0L
    var i = 0
    while (i < Order) {
      d |= ((x >> i) & 1L) << (2 * i)
      d |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    d
  }

  private def center(g: Geometry): (Double, Double) = {
    val e = g.getEnvelopeInternal
    ((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2)
  }

  /** Sort key for EMPTY geometries: past every curve position (curve max
    * is 2^32 - 1), so empties cluster after all located geometries —
    * the reference's sd_order contract (test_order.py: empties sort
    * after non-empties; SQL NULLs order by engine null placement). */
  val EmptyKey: Long = 1L << 32

  def hilbert(g: Geometry, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Long = {
    if (g.isEmpty) return EmptyKey
    val (cx, cy) = center(g)
    hilbertIndex(scale(cx, xmin, xmax), scale(cy, ymin, ymax))
  }

  def morton(g: Geometry, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Long = {
    if (g.isEmpty) return EmptyKey
    val (cx, cy) = center(g)
    mortonIndex(scale(cx, xmin, xmax), scale(cy, ymin, ymax))
  }

  /** Default lon/lat world bounds, as SD_Order does for EPSG:4326. */
  def hilbertLonLat(g: Geometry): Long = hilbert(g, -180, -90, 180, 90)
}
