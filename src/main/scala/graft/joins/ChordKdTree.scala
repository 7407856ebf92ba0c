package graft.joins

/** 3D kd-tree over unit-sphere embeddings of lon/lat points, for exact
  * branch-and-bound spheroid KNN: squared chord distance |u-v|² is
  * strictly monotone in great-circle distance, so k-nearest by chord is
  * k-nearest by geodesic meters — no O(|q|·|o|) full rank. Wrap-safe by
  * construction: poles and the antimeridian are ordinary points of the
  * embedded sphere (the scale fix for the reference's spheroid KNN mode,
  * rust/sedona-functions/src/st_knn.rs:30-44).
  *
  * Build is O(m log m) once per executor over the broadcast object side;
  * each query is O(log m + k) expected.
  */
final class ChordKdTree(n: Int) {
  private val pts = new Array[Double](3 * n)
  private val idx = Array.tabulate(n)(identity)
  private var filled = 0

  def add(lon: Double, lat: Double): Unit = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    pts(3 * filled) = math.cos(phi) * math.cos(lam)
    pts(3 * filled + 1) = math.cos(phi) * math.sin(lam)
    pts(3 * filled + 2) = math.sin(phi)
    filled += 1
  }

  def build(): Unit = {
    require(filled == n, s"ChordKdTree: $filled of $n points added")
    buildRange(0, n, 0)
  }

  @inline private def coord(i: Int, axis: Int): Double = pts(3 * idx(i) + axis)

  private def buildRange(lo: Int, hi: Int, depth: Int): Unit = {
    if (hi - lo <= 1) return
    val axis = depth % 3
    val mid = (lo + hi) >>> 1
    quickSelect(lo, hi, mid, axis)
    buildRange(lo, mid, depth + 1)
    buildRange(mid + 1, hi, depth + 1)
  }

  /** Hoare-partition quickselect of position `target` in [lo, hi) by the
    * given axis (deterministic median-of-range pivot). */
  private def quickSelect(lo0: Int, hi0: Int, target: Int, axis: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 1) {
      val pivot = coord((lo + hi) >>> 1, axis)
      var i = lo; var j = hi - 1
      while (i <= j) {
        while (coord(i, axis) < pivot) i += 1
        while (coord(j, axis) > pivot) j -= 1
        if (i <= j) {
          val t = idx(i); idx(i) = idx(j); idx(j) = t
          i += 1; j -= 1
        }
      }
      if (target <= j) hi = j + 1
      else if (target >= i) lo = i
      else return
    }
  }

  @inline def dist2(q: Array[Double], item: Int): Double = {
    val dx = q(0) - pts(3 * item)
    val dy = q(1) - pts(3 * item + 1)
    val dz = q(2) - pts(3 * item + 2)
    dx * dx + dy * dy + dz * dz
  }

  /** Unit-vector embedding of a lon/lat query point. */
  def embed(lon: Double, lat: Double): Array[Double] = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    Array(math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam),
      math.sin(phi))
  }

  /** Squared chord distance of the kth nearest point to `q`. */
  def kthDist2(q: Array[Double], k: Int): Double = {
    val heap = new java.util.PriorityQueue[java.lang.Double](k,
      java.util.Collections.reverseOrder[java.lang.Double]())
    def visit(lo: Int, hi: Int, depth: Int): Unit = {
      if (lo >= hi) return
      val mid = (lo + hi) >>> 1
      val d2 = dist2(q, idx(mid))
      if (heap.size < k) heap.add(d2)
      else if (d2 < heap.peek) { heap.poll(); heap.add(d2) }
      if (hi - lo == 1) return
      val axis = depth % 3
      val diff = q(axis) - coord(mid, axis)
      val (nl, nh, fl, fh) =
        if (diff < 0) (lo, mid, mid + 1, hi) else (mid + 1, hi, lo, mid)
      visit(nl, nh, depth + 1)
      if (heap.size < k || diff * diff <= heap.peek) visit(fl, fh, depth + 1)
    }
    visit(0, n, 0)
    heap.peek
  }

  /** All item ids with squared chord distance <= r2 from `q`. */
  def range(q: Array[Double], r2: Double): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    def visit(lo: Int, hi: Int, depth: Int): Unit = {
      if (lo >= hi) return
      val mid = (lo + hi) >>> 1
      if (dist2(q, idx(mid)) <= r2) out += idx(mid)
      if (hi - lo == 1) return
      val axis = depth % 3
      val diff = q(axis) - coord(mid, axis)
      val (nl, nh, fl, fh) =
        if (diff < 0) (lo, mid, mid + 1, hi) else (mid + 1, hi, lo, mid)
      visit(nl, nh, depth + 1)
      if (diff * diff <= r2) visit(fl, fh, depth + 1)
    }
    visit(0, n, 0)
    out.toArray
  }
}
