package graft.functions

import org.locationtech.jts.geom.Geometry

/** S2 cell-id kernels — the reference's `s2_cellidfrompoint` /
  * `s2_coveringcellids` SQL surface (c/sedona-s2geography/src/kernels.rs:
  * 34,237-296, docs/reference/sql/s2_*.qmd), implemented from the public
  * S2 geometry cell decomposition: unit sphere → cube face → quadratic
  * (u,v)→(s,t) projection → 2^30 × 2^30 leaf grid → Hilbert curve
  * position, id = face·2^61 + 2·pos + 1.
  *
  * Leaf ids are bit-exact vs the published numbering (the reference's own
  * anchors: POINT(0 0) → 2^60+1, see S2 test in ReferenceCasesSpec).
  * Coverings satisfy the documented contract (a set of cells whose union
  * contains the geography, levels within [min_level, max_level], at most
  * max_cells after the min-level phase) — cell CHOICE intentionally does
  * not chase S2's RegionCoverer, whose output the reference's own tests
  * call unstable across versions.
  */
object S2Cells {

  private val MaxLevel = 30
  private val MaxSize = 1 << MaxLevel // 2^30

  // Hilbert sub-cell tables (S2 s2coords kIJtoPos / kPosToOrientation;
  // orientation bits: 1 = swap, 2 = invert)
  private val IjToPos: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 3, 1, 2), Array(2, 3, 1, 0), Array(2, 1, 3, 0))
  private val PosToIj: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val PosToOrientation: Array[Int] = Array(1, 0, 0, 3)

  /** Leaf (level 30) cell id of a lon/lat point in degrees. */
  def leafCellId(lon: Double, lat: Double): Long = {
    val phi = math.toRadians(lat)
    val theta = math.toRadians(lon)
    val x = math.cos(phi) * math.cos(theta)
    val y = math.cos(phi) * math.sin(theta)
    val z = math.sin(phi)
    val (face, u, v) = xyzToFaceUV(x, y, z)
    val i = stToIj(uvToSt(u))
    val j = stToIj(uvToSt(v))
    fromFaceIJ(face, i, j)
  }

  private def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val face = axis match {
      case 0 => if (x > 0) 0 else 3
      case 1 => if (y > 0) 1 else 4
      case _ => if (z > 0) 2 else 5
    }
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case _ => (5, -y / z, -x / z)
    }
  }

  /** Quadratic projection (the S2_QUADRATIC_PROJECTION default). */
  @inline private def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  @inline private def stToUv(s: Double): Double =
    if (s >= 0.5) (4 * s * s - 1) / 3 else (1 - 4 * (1 - s) * (1 - s)) / 3

  @inline private def stToIj(s: Double): Int =
    math.max(0, math.min(MaxSize - 1, math.floor(s * MaxSize).toInt))

  /** Hilbert position of leaf (i, j) on `face`, bit pair per level. */
  private def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var pos = 0L
    var orientation = face & 1
    var k = MaxLevel - 1
    while (k >= 0) {
      val ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
      val p = IjToPos(orientation)(ij)
      pos = (pos << 2) | p
      orientation ^= PosToOrientation(p)
      k -= 1
    }
    (face.toLong << 61) | (pos << 1) | 1L
  }

  /** Cell level from the position of the lowest set bit. */
  def level(id: Long): Int =
    MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  /** Ancestor of `id` at `lvl` (lvl <= level(id)). */
  def parent(id: Long, lvl: Int): Long = {
    val lsb = 1L << (2 * (MaxLevel - lvl))
    (id & -lsb) | lsb
  }

  // ---- covering ----------------------------------------------------

  /** A cell as (face, level, Hilbert-position prefix of 2·level bits). */
  private final case class Cell(face: Int, lvl: Int, pos: Long) {
    def id: Long = {
      val shift = 2 * (MaxLevel - lvl)
      (face.toLong << 61) | (pos << (shift + 1)) | (1L << shift)
    }
    def children: Seq[Cell] = (0 until 4).map(c => Cell(face, lvl + 1, (pos << 2) | c))
  }

  /** (i0, j0) of the cell's leaf-grid rectangle + per-side size, walking
    * the Hilbert path back down. */
  private def cellIjRect(c: Cell): (Int, Int, Int) = {
    var i = 0; var j = 0
    var orientation = c.face & 1
    var k = 0
    while (k < c.lvl) {
      val p = ((c.pos >> (2 * (c.lvl - 1 - k))) & 3).toInt
      val ij = PosToIj(orientation)(p)
      i = (i << 1) | (ij >> 1)
      j = (j << 1) | (ij & 1)
      orientation ^= PosToOrientation(p)
      k += 1
    }
    val size = 1 << (MaxLevel - c.lvl)
    (i << (MaxLevel - c.lvl), j << (MaxLevel - c.lvl), size)
  }

  private def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  /** Conservative lon/lat bounds of a cell as (latMin, latMax, lon
    * ranges) — face cells use their exact closed-form bounds; deeper
    * cells sample corners + edge midpoints with a quadratic curvature
    * margin, wrap-aware in longitude. Over-covering only ever adds cells
    * to a covering — it never loses coverage. */
  private val LatCorner = math.toDegrees(math.atan2(1.0, math.sqrt(2.0))) // 35.264°
  private def cellBounds(c: Cell): (Double, Double, Seq[(Double, Double)]) = {
    if (c.lvl == 0) return c.face match {
      case 0 => (-45, 45, Seq((-45.0, 45.0)))
      case 1 => (-45, 45, Seq((45.0, 135.0)))
      case 2 => (LatCorner, 90, Seq((-180.0, 180.0)))
      case 3 => (-45, 45, Seq((135.0, 180.0), (-180.0, -135.0)))
      case 4 => (-45, 45, Seq((-135.0, -45.0)))
      case _ => (-90, -LatCorner, Seq((-180.0, 180.0)))
    }
    val (i0, j0, size) = cellIjRect(c)
    val ss = Array(i0.toDouble / MaxSize, (i0 + size * 0.5) / MaxSize,
      (i0 + size).toDouble / MaxSize)
    val ts = Array(j0.toDouble / MaxSize, (j0 + size * 0.5) / MaxSize,
      (j0 + size).toDouble / MaxSize)
    val lons = new Array[Double](9)
    var latMin = Double.MaxValue; var latMax = -Double.MaxValue
    var k = 0
    for (s <- ss; t <- ts) {
      val (x, y, z) = faceUvToXyz(c.face, stToUv(s), stToUv(t))
      lons(k) = math.toDegrees(math.atan2(y, x)); k += 1
      val lat = math.toDegrees(math.atan2(z, math.hypot(x, y)))
      latMin = math.min(latMin, lat); latMax = math.max(latMax, lat)
    }
    // pole cells: the pole sits at the center of faces 2 (N) and 5 (S)
    val half = MaxSize / 2
    val holdsPole = (c.face == 2 || c.face == 5) &&
      i0 <= half && half <= i0 + size && j0 <= half && half <= j0 + size
    // curvature margin: great-circle edges bow quadratically outside the
    // corner/midpoint hull
    def span(vals: Array[Double]): Double = vals.max - vals.min
    val wrapped = span(lons) > 180.0
    val lonsN = if (wrapped) lons.map(l => if (l < 0) l + 360.0 else l) else lons
    val m = 0.003 * math.pow(math.max(latMax - latMin, span(lonsN)), 2) + 1e-9
    latMin = math.max(-90, latMin - m); latMax = math.min(90, latMax + m)
    if (holdsPole) {
      if (c.face == 2) latMax = 90.0 else latMin = -90.0
      return (latMin, latMax, Seq((-180.0, 180.0)))
    }
    val lo = lonsN.min - m; val hi = lonsN.max + m
    val ranges =
      if (!wrapped) Seq((math.max(-180, lo), math.min(180, hi)))
      else {
        // bounds were taken in the [0,360) frame: split back across the
        // antimeridian into [-180,180] pieces
        if (hi - lo >= 360) Seq((-180.0, 180.0))
        else if (lo < 180 && hi > 180) Seq((lo, 180.0), (-180.0, hi - 360.0))
        else if (hi <= 180) Seq((lo, hi))
        else Seq((lo - 360.0, hi - 360.0))
      }
    (latMin, latMax, ranges)
  }

  /** Covering of the geometry's lon/lat envelope by S2 cells. */
  def covering(g: Geometry, minLevel: Int, maxLevel: Int, maxCells: Int): Array[Long] = {
    require(minLevel >= 0 && minLevel <= MaxLevel, s"min_level $minLevel not in [0,30]")
    require(maxLevel >= minLevel && maxLevel <= MaxLevel,
      s"max_level $maxLevel not in [$minLevel,30]")
    require(maxCells > 0, s"max_cells $maxCells must be greater than 0")
    if (g.isEmpty) return Array.empty
    g match {
      case p: org.locationtech.jts.geom.Point =>
        // a point covers with its single ancestor at the finest level
        return Array(parent(leafCellId(p.getX, p.getY), maxLevel))
      case _ => ()
    }
    val env = g.getEnvelopeInternal
    def intersects(c: Cell): Boolean = {
      val (y0, y1, lonRanges) = cellBounds(c)
      y0 <= env.getMaxY && y1 >= env.getMinY &&
        lonRanges.exists { case (x0, x1) => x0 <= env.getMaxX && x1 >= env.getMinX }
    }
    // phase 1: force down to minLevel (level bound is a hard contract)
    var frontier = (0 until 6).map(f => Cell(f, 0, 0L)).filter(intersects).toVector
    while (frontier.exists(_.lvl < minLevel))
      frontier = frontier.flatMap(c =>
        if (c.lvl < minLevel) c.children.filter(intersects) else Vector(c))
    // phase 2: refine largest-first while the budget allows
    var changed = true
    while (changed) {
      changed = false
      val splittable = frontier.filter(_.lvl < maxLevel)
      if (splittable.nonEmpty) {
        val target = splittable.minBy(c => (c.lvl, c.id))
        val kids = target.children.filter(intersects)
        if (frontier.size - 1 + kids.size <= maxCells) {
          frontier = frontier.filterNot(_ == target) ++ kids
          changed = true
        }
      }
    }
    frontier.map(_.id).sorted.toArray
  }
}
