package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 datum-shift grid (.gsb) codec + bilinear shift evaluation — the
  * grid-based datum leg PROJ applies when a transformation has grid files
  * (NADCON/NTv2/OSTN15-as-NTv2; the reference reaches these through PROJ,
  * /root/reference/c/sedona-proj/src/transform.rs). The binary format is
  * public (Canadian NTv2 developer's guide): 16-byte records of an 8-char
  * name + 8-byte value; an 11-record overview header, then per subgrid an
  * 11-record header followed by GS_COUNT 16-byte nodes of four float32s
  * (lat shift, lon shift, lat/lon accuracy) in arc-seconds.
  *
  * Conventions honored here: longitudes in the file are POSITIVE WEST;
  * node rows run south to north, columns east to west (west-positive lon
  * increasing); shifts are target minus source in arc-seconds, so forward
  * is lat' = lat + dLat/3600 and lon' = lon - dLon/3600 on east-positive
  * degrees. Both endiannesses are read (detected from NUM_OREC == 11).
  *
  * Shift evaluation selects the densest subgrid containing the point
  * (children are denser than parents in every published grid) and
  * bilinearly interpolates the four surrounding nodes. Points outside
  * every subgrid pass through unshifted (PROJ's lenient default).
  */
object Ntv2 {

  final case class SubGrid(name: String, parent: String,
      sLat: Double, nLat: Double, eLonW: Double, wLonW: Double,
      latInc: Double, lonInc: Double, nRows: Int, nCols: Int,
      latShift: Array[Float], lonShift: Array[Float]) {

    def contains(latSec: Double, lonWestSec: Double): Boolean =
      latSec >= sLat - 1e-9 && latSec <= nLat + 1e-9 &&
        lonWestSec >= eLonW - 1e-9 && lonWestSec <= wLonW + 1e-9

    /** Bilinear (dLatSec, dLonWestSec) at a point inside the subgrid. */
    def interpolate(latSec: Double, lonWestSec: Double): (Double, Double) = {
      val fr = math.min((latSec - sLat) / latInc, nRows - 1.0)
      val fc = math.min((lonWestSec - eLonW) / lonInc, nCols - 1.0)
      val r0 = math.max(0, math.min(fr.toInt, nRows - 2))
      val c0 = math.max(0, math.min(fc.toInt, nCols - 2))
      val t = fr - r0; val u = fc - c0
      def at(arr: Array[Float], r: Int, c: Int): Double = arr(r * nCols + c)
      def bil(arr: Array[Float]): Double =
        (1 - t) * (1 - u) * at(arr, r0, c0) + (1 - t) * u * at(arr, r0, c0 + 1) +
          t * (1 - u) * at(arr, r0 + 1, c0) + t * u * at(arr, r0 + 1, c0 + 1)
      (bil(latShift), bil(lonShift))
    }
  }

  final case class Grid(subs: IndexedSeq[SubGrid]) {
    /** Raw (dLatSec, dLonWestSec) from the densest covering subgrid. */
    def shiftAt(lonDeg: Double, latDeg: Double): Option[(Double, Double)] = {
      val latSec = latDeg * 3600.0
      val lonWestSec = -lonDeg * 3600.0
      val candidates = subs.filter(_.contains(latSec, lonWestSec))
      if (candidates.isEmpty) None
      else Some(candidates.minBy(_.latInc).interpolate(latSec, lonWestSec))
    }

    /** Source datum -> target datum (east-positive degrees); identity
      * outside grid coverage. */
    def forward(lon: Double, lat: Double): (Double, Double) =
      shiftAt(lon, lat) match {
        case Some((dLat, dLonW)) => (lon - dLonW / 3600.0, lat + dLat / 3600.0)
        case None => (lon, lat)
      }

    /** Target datum -> source datum: fixed-point iteration on the forward
      * shift (the shift field is smooth and tiny relative to cell size, so
      * four rounds land far below float32 grid precision). */
    def inverse(lon: Double, lat: Double): (Double, Double) = {
      var sLon = lon; var sLat = lat
      var i = 0
      while (i < 4) {
        shiftAt(sLon, sLat) match {
          case Some((dLat, dLonW)) =>
            sLon = lon + dLonW / 3600.0
            sLat = lat - dLat / 3600.0
          case None => i = 4
        }
        i += 1
      }
      (sLon, sLat)
    }
  }

  // ------------------------------------------------------------------
  // binary codec
  // ------------------------------------------------------------------

  def read(bytes: Array[Byte]): Grid = {
    require(bytes.length >= 11 * 16, "ntv2: truncated overview header")
    // endianness: NUM_OREC's int32 must be 11
    val le = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 11
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(bytes).order(order)
    require(bb.getInt(8) == 11, "ntv2: bad NUM_OREC (not an NTv2 file?)")
    def name(off: Int): String = new String(bytes, off, 8, "US-ASCII")
    def recInt(off: Int): Int = bb.getInt(off + 8)
    def recDbl(off: Int): Double = bb.getDouble(off + 8)
    def recStr(off: Int): String = new String(bytes, off + 8, 8, "US-ASCII").trim
    var pos = 0
    var nSub = 0
    // overview: walk 11 records, pull NUM_FILE
    for (i <- 0 until 11) {
      if (name(pos).startsWith("NUM_FILE")) nSub = recInt(pos)
      pos += 16
    }
    require(nSub > 0, "ntv2: NUM_FILE must be positive")
    val subs = (0 until nSub).map { _ =>
      var nm = ""; var parent = ""
      var sLat = 0.0; var nLat = 0.0; var eLon = 0.0; var wLon = 0.0
      var latInc = 0.0; var lonInc = 0.0; var count = 0
      for (i <- 0 until 11) {
        name(pos).trim match {
          case "SUB_NAME" => nm = recStr(pos)
          case "PARENT" => parent = recStr(pos)
          case "S_LAT" => sLat = recDbl(pos)
          case "N_LAT" => nLat = recDbl(pos)
          case "E_LONG" => eLon = recDbl(pos)
          case "W_LONG" => wLon = recDbl(pos)
          case "LAT_INC" => latInc = recDbl(pos)
          case "LONG_INC" => lonInc = recDbl(pos)
          case "GS_COUNT" => count = recInt(pos)
          case _ => // CREATED/UPDATED
        }
        pos += 16
      }
      require(latInc > 0 && lonInc > 0, s"ntv2: bad increments in subgrid $nm")
      val nRows = math.round((nLat - sLat) / latInc).toInt + 1
      val nCols = math.round((wLon - eLon) / lonInc).toInt + 1
      require(nRows * nCols == count,
        s"ntv2: GS_COUNT $count != $nRows x $nCols for subgrid $nm")
      require(pos + count * 16 <= bytes.length, s"ntv2: truncated nodes in $nm")
      val latS = new Array[Float](count)
      val lonS = new Array[Float](count)
      var i = 0
      while (i < count) {
        latS(i) = bb.getFloat(pos)
        lonS(i) = bb.getFloat(pos + 4)
        pos += 16
        i += 1
      }
      SubGrid(nm, parent, sLat, nLat, eLon, wLon, latInc, lonInc, nRows, nCols,
        latS, lonS)
    }
    Grid(subs)
  }

  /** Serialize a grid back to .gsb (little-endian; accuracies written 0) —
    * fixture tooling and a way to materialize programmatic grids. */
  def write(g: Grid, systemFrom: String = "SRC", systemTo: String = "DST"): Array[Byte] = {
    val total = 11 * 16 + g.subs.map(s => 11 * 16 + s.latShift.length * 16).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def rec(nm: String)(put: => Unit): Unit = {
      bb.put(String.format("%-8s", nm).getBytes("US-ASCII")); put
    }
    def recI(nm: String, v: Int): Unit = rec(nm) { bb.putInt(v); bb.putInt(0) }
    def recD(nm: String, v: Double): Unit = rec(nm) { bb.putDouble(v) }
    def recS(nm: String, v: String): Unit =
      rec(nm)(bb.put(String.format("%-8s", v).getBytes("US-ASCII")))
    recI("NUM_OREC", 11); recI("NUM_SREC", 11); recI("NUM_FILE", g.subs.length)
    recS("GS_TYPE", "SECONDS"); recS("VERSION", "NTv2.0")
    recS("SYSTEM_F", systemFrom); recS("SYSTEM_T", systemTo)
    recD("MAJOR_F", 6378137.0); recD("MINOR_F", 6356752.314)
    recD("MAJOR_T", 6378137.0); recD("MINOR_T", 6356752.314)
    g.subs.foreach { s =>
      recS("SUB_NAME", s.name); recS("PARENT", if (s.parent.isEmpty) "NONE" else s.parent)
      recS("CREATED", "19700101"); recS("UPDATED", "19700101")
      recD("S_LAT", s.sLat); recD("N_LAT", s.nLat)
      recD("E_LONG", s.eLonW); recD("W_LONG", s.wLonW)
      recD("LAT_INC", s.latInc); recD("LONG_INC", s.lonInc)
      recI("GS_COUNT", s.latShift.length)
      for (i <- s.latShift.indices) {
        bb.putFloat(s.latShift(i)); bb.putFloat(s.lonShift(i))
        bb.putFloat(0.0f); bb.putFloat(0.0f)
      }
    }
    bb.array()
  }
}
