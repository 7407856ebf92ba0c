package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** JPEG 2000 Part-1 codec, LOSSLESS profile: reversible 5/3 wavelet,
  * EBCOT tier-1 (MQ arithmetic coder, three coding passes per bitplane),
  * tier-2 packet headers with tag trees, LRCP single-layer codestream.
  * The one raster format the reference reaches only through GDAL's
  * openjpeg driver (rust/sedona-raster-gdal/src/register.rs:23-34) —
  * Sentinel-2 ships in it — re-implemented here from the published
  * ISO/IEC 15444-1 algorithm descriptions (Annexes B, C, D, F).
  *
  * Scope and validation honesty:
  *  - encode: raw .j2k codestream — 1..N components, bit depth <= 16
  *    signed or unsigned, reversible 5/3 and lossy 9/7 (scalar
  *    expounded or DERIVED quantization), RCT/ICT, multiple tiles and
  *    tile-parts (per-resolution grouping, TLM), quality layers, all
  *    five progression orders, precincts, SOP/EPH, code-blocks
  *    2^2..2^10 square, per-component COC overrides (code-block size,
  *    precincts, decomposition LEVELS, wavelet TRANSFORM), SIZ
  *    component SUBSAMPLING (single-tile, MCT-free; components decode
  *    at their own plane dims — the 4:2:0 chroma shape, windowed decode
  *    included), POC progression-order changes and RGN maxshift ROI
  *    scaling (each from the main header OR the first tile-part
  *    header), and PPM/PPT packed packet headers.
  *  - decode: the same feature set, from a raw codestream or a JP2 box
  *    container (the `jp2c` box is located and decoded; other boxes are
  *    metadata this codec does not need). Still refusing loudly:
  *    code-block coder option flags (bypass/termall/... — EBCOT-core
  *    variants with no fixture to certify against), POC/RGN in a
  *    NON-first tile-part (a mid-stream progression/Mb change over
  *    partially-consumed packets), and RGN on lossy (9/7) components.
  *  - The DWT, tag trees, pass-count / length codewords, and packet
  *    structure are pinned by hand-computed unit fixtures; the MQ coder
  *    and tier-1 context machine are pinned by spec invariants plus
  *    dense roundtrip fuzz (Jpeg2000Spec). NO third-party-encoded
  *    fixture exists in this offline environment, so byte-exact interop
  *    with openjpeg-encoded files is NOT certified — a decoder-side
  *    context-table transcription error would not be caught by
  *    roundtrips.
  */
private[graft] object Jpeg2000 {

  /** One image component: `samples` row-major, already in its signed
    * representation (unsigned data holds raw magnitudes; the DC level
    * shift is applied internally on encode and undone on decode). */
  final case class Plane(w: Int, h: Int, depth: Int, signed: Boolean,
      samples: Array[Int])

  // =====================================================================
  // MQ arithmetic coder (ISO 15444-1 Annex C; the JBIG2-shared coder).
  // State table: (Qe, NMPS, NLPS, SWITCH).
  // =====================================================================

  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Tier-1 context count: 0-8 zero coding, 9-13 sign coding, 14-16
    * magnitude refinement, 17 run-length, 18 uniform. */
  private val NCtx = 19
  private val CtxRL = 17
  private val CtxUNI = 18

  private def initCtx(): (Array[Int], Array[Int]) = {
    val idx = new Array[Int](NCtx)
    val mps = new Array[Int](NCtx)
    idx(0) = 4   // ZC context 0
    idx(CtxRL) = 3
    idx(CtxUNI) = 46
    (idx, mps)
  }

  private final class MqEncoder {
    private var a = 0x8000
    private var c = 0L
    private var ct = 12
    private val out = new java.io.ByteArrayOutputStream(1 << 12)
    // the spec's BP = BPST-1 scratch byte: it absorbs a first-byte carry
    // and is NEVER part of the output (Annex C.2.3/C.2.9) — modeling it
    // as "no byte" would let that carry leak a spurious byte into the
    // stream, so it exists explicitly and is dropped at the first emit
    private var b = 0
    private var scratch = true

    var (ctxIdx, ctxMps) = initCtx()

    def encode(d: Int, cx: Int): Unit = {
      val i = ctxIdx(cx)
      val qe = Qe(i)
      if (d == ctxMps(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          ctxIdx(cx) = Nmps(i)
          renorm()
        } else c += qe
      } else {               // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
        ctxIdx(cx) = Nlps(i)
        renorm()
      }
    }

    private def renorm(): Unit = {
      do {
        a <<= 1
        c <<= 1
        ct -= 1
        if (ct == 0) byteOut()
      } while ((a & 0x8000) == 0)
    }

    private def emit(v: Int): Unit = {
      if (scratch) scratch = false else out.write(b)
      b = v
    }

    private def byteOut(): Unit = {
      if (b == 0xFF) {
        emit((c >> 20).toInt); c &= 0xFFFFF; ct = 7
      } else if (c < 0x8000000L) {
        emit((c >> 19).toInt); c &= 0x7FFFF; ct = 8
      } else {
        b += 1
        if (b == 0xFF) {
          c &= 0x7FFFFFFL
          emit((c >> 20).toInt); c &= 0xFFFFF; ct = 7
        } else {
          emit((c >> 19).toInt); c &= 0x7FFFF; ct = 8
        }
      }
    }

    /** Terminate and return the codeword segment (trailing 0xFF dropped,
      * as the standard's FLUSH permits). */
    def flush(): Array[Byte] = {
      // SETBITS
      val tempC = c + a
      c |= 0xFFFF
      if (c >= tempC) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (!scratch && b != 0xFF) out.write(b)
      out.toByteArray
    }
  }

  private final class MqDecoder(data: Array[Byte]) {
    private var bp = 0
    private var c = 0L
    private var ct = 0
    private var a = 0

    var (ctxIdx, ctxMps) = initCtx()

    private def byteAt(i: Int): Int = if (i < data.length) data(i) & 0xFF else 0xFF

    // INITDEC
    c = byteAt(0).toLong << 16
    byteIn()
    c <<= 7
    ct -= 7
    a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: Int): Int = {
      val i = ctxIdx(cx)
      val qe = Qe(i)
      var d = 0
      a -= qe
      if (((c >> 16) & 0xFFFF) < qe) {
        // LPS exchange
        if (a < qe) { d = ctxMps(cx); ctxIdx(cx) = Nmps(i) }
        else {
          d = 1 - ctxMps(cx)
          if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
          ctxIdx(cx) = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          // MPS exchange
          if (a < qe) {
            d = 1 - ctxMps(cx)
            if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
            ctxIdx(cx) = Nlps(i)
          } else { d = ctxMps(cx); ctxIdx(cx) = Nmps(i) }
          renorm()
        } else d = ctxMps(cx)
      }
      d
    }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteIn()
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
      } while ((a & 0x8000) == 0)
    }
  }

  // =====================================================================
  // Reversible 5/3 wavelet (Annex F): integer lifting with symmetric
  // extension. Forward splits x[0..n) (positions anchored at 0) into
  // low s = ceil(n/2) and high d = floor(n/2) halves.
  // =====================================================================

  /** In-place-free 1D forward: returns (low, high). */
  private[sources] def fwd53(x: Array[Int]): (Array[Int], Array[Int]) = {
    val n = x.length
    val ns = (n + 1) / 2
    val nd = n / 2
    if (n == 1) return (Array(x(0)), Array.empty[Int])
    val d = new Array[Int](nd)
    val s = new Array[Int](ns)
    var i = 0
    while (i < nd) {
      val right = if (2 * i + 2 < n) x(2 * i + 2) else x(2 * i) // mirror E(n)=E(n-2)
      d(i) = x(2 * i + 1) - ((x(2 * i) + right) >> 1)
      i += 1
    }
    i = 0
    while (i < ns) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)       // mirror d(-1)=d(0)
      val dr = if (i < nd) d(i) else d(nd - 1)          // mirror d(nd)=d(nd-1)
      s(i) = x(2 * i) + ((dl + dr + 2) >> 2)
      i += 1
    }
    (s, d)
  }

  /** Exact inverse of [[fwd53]]. */
  private[sources] def inv53(s: Array[Int], d: Array[Int]): Array[Int] = {
    val n = s.length + d.length
    if (n == 1) return Array(s(0))
    val x = new Array[Int](n)
    var i = 0
    while (i < s.length) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)
      val dr = if (i < d.length) d(i) else d(d.length - 1)
      x(2 * i) = s(i) - ((dl + dr + 2) >> 2)
      i += 1
    }
    i = 0
    while (i < d.length) {
      val right = if (2 * i + 2 < n) x(2 * i + 2) else x(2 * i)
      x(2 * i + 1) = d(i) + ((x(2 * i) + right) >> 1)
      i += 1
    }
    x
  }

  /** One 2D decomposition of a w x h plane: rows first, then columns —
    * quadrant layout (LL | HL) over (LH | HH), JPEG2000 band naming
    * (HL = horizontally high-pass). The inverse mirrors the order, so
    * the choice is reversible by construction. */
  private def fwd2d(a: Array[Int], w: Int, h: Int): (Array[Int], Int, Int) = {
    val lw = (w + 1) / 2
    val lh = (h + 1) / 2
    val t = new Array[Int](w * h)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      System.arraycopy(a, y * w, row, 0, w)
      val (s, d) = fwd53(row)
      System.arraycopy(s, 0, t, y * w, s.length)
      System.arraycopy(d, 0, t, y * w + lw, d.length)
      y += 1
    }
    val colBuf = new Array[Int](h)
    var x = 0
    while (x < w) {
      var i = 0
      while (i < h) { colBuf(i) = t(i * w + x); i += 1 }
      val (s, d) = fwd53(colBuf)
      i = 0
      while (i < s.length) { t(i * w + x) = s(i); i += 1 }
      i = 0
      while (i < d.length) { t((lh + i) * w + x) = d(i); i += 1 }
      x += 1
    }
    (t, lw, lh)
  }

  private def inv2d(t: Array[Int], w: Int, h: Int): Array[Int] = {
    val lw = (w + 1) / 2
    val lh = (h + 1) / 2
    val a = new Array[Int](w * h)
    System.arraycopy(t, 0, a, 0, w * h)
    val colS = new Array[Int](lh)
    val colD = new Array[Int](h - lh)
    var x = 0
    while (x < w) {
      var i = 0
      while (i < lh) { colS(i) = a(i * w + x); i += 1 }
      i = 0
      while (i < h - lh) { colD(i) = a((lh + i) * w + x); i += 1 }
      val col = inv53(colS, colD)
      i = 0
      while (i < h) { a(i * w + x) = col(i); i += 1 }
      x += 1
    }
    val rowS = new Array[Int](lw)
    val rowD = new Array[Int](w - lw)
    var y = 0
    while (y < h) {
      System.arraycopy(a, y * w, rowS, 0, lw)
      System.arraycopy(a, y * w + lw, rowD, 0, w - lw)
      val row = inv53(rowS, rowD)
      System.arraycopy(row, 0, a, y * w, w)
      y += 1
    }
    a
  }

  // =====================================================================
  // Irreversible 9/7 DWT (Annex F.4.8.2) — double lifting, the LOSSY
  // path. Same split/mirror conventions as the 5/3 above (the mirror is
  // whole-sample symmetric extension expressed on the lifted bands);
  // scaling K on the high band and 1/K on the low band matches the
  // openjpeg/ISO normalization (decode unscales with 2/K and K).
  // =====================================================================

  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  /** 1D forward 9/7: returns (low, high). */
  private[sources] def fwd97(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val ns = (n + 1) / 2
    val nd = n / 2
    if (n == 1) return (Array(x(0)), Array.empty[Double])
    val d = new Array[Double](nd)
    val s = new Array[Double](ns)
    var i = 0
    while (i < nd) {
      val right = if (2 * i + 2 < n) x(2 * i + 2) else x(2 * i)
      d(i) = x(2 * i + 1) + A97 * (x(2 * i) + right)
      i += 1
    }
    i = 0
    while (i < ns) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)
      val dr = if (i < nd) d(i) else d(nd - 1)
      s(i) = x(2 * i) + B97 * (dl + dr)
      i += 1
    }
    i = 0
    while (i < nd) {
      val sr = if (i + 1 < ns) s(i + 1) else s(ns - 1)
      d(i) += G97 * (s(i) + sr)
      i += 1
    }
    i = 0
    while (i < ns) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)
      val dr = if (i < nd) d(i) else d(nd - 1)
      s(i) = (s(i) + D97 * (dl + dr)) / K97
      i += 1
    }
    i = 0
    while (i < nd) { d(i) *= K97 / 2.0; i += 1 }
    (s, d)
  }

  /** Exact float inverse of [[fwd97]]. */
  private[sources] def inv97(s0: Array[Double], d0: Array[Double]): Array[Double] = {
    val n = s0.length + d0.length
    if (n == 1) return Array(s0(0))
    val ns = s0.length
    val nd = d0.length
    val s = new Array[Double](ns)
    val d = new Array[Double](nd)
    var i = 0
    while (i < nd) { d(i) = d0(i) * (2.0 / K97); i += 1 }
    i = 0
    while (i < ns) { s(i) = s0(i) * K97; i += 1 }
    i = 0
    while (i < ns) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)
      val dr = if (i < nd) d(i) else d(nd - 1)
      s(i) -= D97 * (dl + dr)
      i += 1
    }
    i = 0
    while (i < nd) {
      val sr = if (i + 1 < ns) s(i + 1) else s(ns - 1)
      d(i) -= G97 * (s(i) + sr)
      i += 1
    }
    val x = new Array[Double](n)
    i = 0
    while (i < ns) {
      val dl = if (i - 1 >= 0) d(i - 1) else d(0)
      val dr = if (i < nd) d(i) else d(nd - 1)
      x(2 * i) = s(i) - B97 * (dl + dr)
      i += 1
    }
    i = 0
    while (i < nd) {
      val right = if (2 * i + 2 < n) x(2 * i + 2) else x(2 * i)
      x(2 * i + 1) = d(i) - A97 * (x(2 * i) + right)
      i += 1
    }
    x
  }

  private def fwd2d97(a: Array[Double], w: Int, h: Int): (Array[Double], Int, Int) = {
    val lw = (w + 1) / 2
    val lh = (h + 1) / 2
    val t = new Array[Double](w * h)
    val row = new Array[Double](w)
    var y = 0
    while (y < h) {
      System.arraycopy(a, y * w, row, 0, w)
      val (s, d) = fwd97(row)
      System.arraycopy(s, 0, t, y * w, s.length)
      System.arraycopy(d, 0, t, y * w + lw, d.length)
      y += 1
    }
    val colBuf = new Array[Double](h)
    var x = 0
    while (x < w) {
      var i = 0
      while (i < h) { colBuf(i) = t(i * w + x); i += 1 }
      val (s, d) = fwd97(colBuf)
      i = 0
      while (i < s.length) { t(i * w + x) = s(i); i += 1 }
      i = 0
      while (i < d.length) { t((lh + i) * w + x) = d(i); i += 1 }
      x += 1
    }
    (t, lw, lh)
  }

  private def inv2d97(t: Array[Double], w: Int, h: Int): Array[Double] = {
    val lw = (w + 1) / 2
    val lh = (h + 1) / 2
    val a = new Array[Double](w * h)
    System.arraycopy(t, 0, a, 0, w * h)
    val colS = new Array[Double](lh)
    val colD = new Array[Double](h - lh)
    var x = 0
    while (x < w) {
      var i = 0
      while (i < lh) { colS(i) = a(i * w + x); i += 1 }
      i = 0
      while (i < h - lh) { colD(i) = a((lh + i) * w + x); i += 1 }
      val col = inv97(colS, colD)
      i = 0
      while (i < h) { a(i * w + x) = col(i); i += 1 }
      x += 1
    }
    val rowS = new Array[Double](lw)
    val rowD = new Array[Double](w - lw)
    var y = 0
    while (y < h) {
      System.arraycopy(a, y * w, rowS, 0, lw)
      System.arraycopy(a, y * w + lw, rowD, 0, w - lw)
      val row = inv97(rowS, rowD)
      System.arraycopy(row, 0, a, y * w, w)
      y += 1
    }
    a
  }

  // =====================================================================
  // Scalar quantization (Annex E) — the lossy path's rate knob.
  // Δ_b = 2^(R_b − ε_b) · (1 + μ_b / 2^11), signalled per subband as a
  // 16-bit SPqcd word (ε << 11 | μ) under Sqcd style 2 ("scalar
  // expounded"). The encoder quantizes with the SIGNALLED step (not the
  // requested one), so encode/decode agree bit-for-bit on the grid.
  // =====================================================================

  /** Reconstructed step size from a signalled (ε, μ) at dynamic range
    * exponent Rb. */
  private[sources] def stepOf(eps: Int, mu: Int, rb: Int): Double =
    math.pow(2.0, rb - eps) * (1.0 + mu / 2048.0)

  /** Signalling (ε, μ) whose step is the closest representable to the
    * requested Δ (ε clamped to the 5-bit field). */
  private[sources] def stepToEpsMu(delta: Double, rb: Int): (Int, Int) = {
    require(delta > 0, s"jpeg2000: quantization step must be positive: $delta")
    val e2 = math.floor(math.log(delta) / math.log(2.0)).toInt
    var eps = rb - e2
    var mu = math.round((delta / math.pow(2.0, e2) - 1.0) * 2048.0).toInt
    if (mu >= 2048) { mu = 0; eps -= 1 } // mantissa rounded up to 2.0
    if (eps < 0) { eps = 0; mu = 2047 }  // clamp: biggest representable step
    if (eps > 31) { eps = 31; mu = 0 }   // clamp: smallest representable step
    (eps, mu)
  }

  // =====================================================================
  // Tag trees (Annex B.10.2)
  // =====================================================================

  private[sources] final class TagTree(val w: Int, val h: Int) {
    // levels(0) is the leaf grid; the root is the last level (1x1)
    private val levels = {
      val ls = ArrayBuffer[(Int, Int)]((w, h))
      while (ls.last._1 > 1 || ls.last._2 > 1)
        ls += (((ls.last._1 + 1) / 2, (ls.last._2 + 1) / 2))
      ls.toArray
    }
    private val values = levels.map { case (lw, lh) =>
      Array.fill(lw * lh)(Int.MaxValue)
    }
    // decode/encode shared visible-state: per node, the lower bound
    // established so far and whether the node's value is final
    private val lower = levels.map { case (lw, lh) => new Array[Int](lw * lh) }
    private val known = levels.map { case (lw, lh) => new Array[Boolean](lw * lh) }

    def set(x: Int, y: Int, v: Int): Unit = {
      values(0)(y * w + x) = v
      // internal nodes = min of children
      var l = 0
      while (l + 1 < levels.length) {
        val (cw, ch) = levels(l)
        val (pw, _) = levels(l + 1)
        var j = 0
        while (j < ch) {
          var i = 0
          while (i < cw) {
            val p = (j / 2) * pw + (i / 2)
            val c = values(l)(j * cw + i)
            if (c < values(l + 1)(p)) values(l + 1)(p) = c
            i += 1
          }
          j += 1
        }
        l = l + 1
      }
    }

    def reset(): Unit = {
      lower.foreach(a => java.util.Arrays.fill(a, 0))
      known.foreach(a => java.util.Arrays.fill(a, false))
    }

    /** Encode: emit bits so the decoder learns whether value(x,y) <
      * threshold (and the exact value if so). */
    def encode(bw: BitWriter, x: Int, y: Int, threshold: Int): Unit = {
      var l = levels.length - 1
      var lowBound = 0
      while (l >= 0) {
        val (lw, _) = levels(l)
        val ni = (y >> l) * lw + (x >> l)
        if (lower(l)(ni) < lowBound) lower(l)(ni) = lowBound
        val v = values(l)(ni)
        var break = false
        while (!known(l)(ni) && !break) {
          if (lower(l)(ni) >= threshold) break = true // can't resolve yet
          else if (v > lower(l)(ni)) { bw.bit(0); lower(l)(ni) += 1 }
          else { bw.bit(1); known(l)(ni) = true }
        }
        lowBound = math.max(lowBound, if (known(l)(ni)) v else lower(l)(ni))
        l -= 1
      }
    }

    /** Decode counterpart: returns the leaf's value if it resolved below
      * `threshold`, else Int.MaxValue (meaning ">= threshold"). */
    def decode(br: BitReader, x: Int, y: Int, threshold: Int): Int = {
      var l = levels.length - 1
      var lowBound = 0
      var result = Int.MaxValue
      while (l >= 0) {
        val (lw, _) = levels(l)
        val ni = (y >> l) * lw + (x >> l)
        if (lower(l)(ni) < lowBound) lower(l)(ni) = lowBound
        var break = false
        while (!known(l)(ni) && !break) {
          if (lower(l)(ni) >= threshold) break = true
          else if (br.bit() == 0) lower(l)(ni) += 1
          else known(l)(ni) = true
        }
        lowBound = math.max(lowBound, lower(l)(ni))
        if (l == 0 && known(0)(ni)) result = lower(0)(ni)
        l -= 1
      }
      result
    }
  }

  // =====================================================================
  // Packet-header bit IO with the 0xFF stuffing rule (after a 0xFF byte
  // only 7 bits follow in the next byte).
  // =====================================================================

  private[sources] final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      val limit = if (out.nonEmpty && (out.last & 0xFF) == 0xFF) 7 else 8
      if (nBits == limit) { out += cur.toByte; cur = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    /** Pad to a byte boundary with 0s (plus the stuffing byte if the
      * last full byte was 0xFF). */
    def finish(): Array[Byte] = {
      if (nBits > 0) {
        val limit = if (out.nonEmpty && (out.last & 0xFF) == 0xFF) 7 else 8
        out += (cur << (limit - nBits)).toByte
      } else if (out.nonEmpty && (out.last & 0xFF) == 0xFF) {
        out += 0.toByte // a stuffing byte must follow a trailing 0xFF
      }
      out.toArray
    }
  }

  // =====================================================================
  // Tier-1: EBCOT code-block coding (Annex D). Coefficients are coded in
  // sign-magnitude form over bitplanes, three passes per plane
  // (significance propagation, magnitude refinement, cleanup), stripe
  // scan of 4 rows. Context formation per Tables D.1-D.4:
  //  - zero coding: 9 contexts from neighbor significance counts, with
  //    the HL table the transpose of LL/LH and HH keyed on diagonals;
  //  - sign coding: 5 contexts + predicted sign from H/V contributions;
  //  - magnitude refinement: 3 contexts (first / first-with-neighbors /
  //    subsequent);
  //  - cleanup run mode: 4-row all-clear columns code one RL bit, a
  //    broken run positions its first 1 with two UNIFORM-context bits.
  // Single MQ codeword per code-block (no bypass, no per-pass resets).
  // =====================================================================

  /** Band orientation: 0 = LL, 1 = HL, 2 = LH, 3 = HH. */
  private def zcCtx(band: Int, h: Int, v: Int, d: Int): Int = {
    val (hh, vv) = if (band == 1) (v, h) else (h, v) // HL: transpose
    if (band == 3) {
      if (d >= 3) 8
      else if (d == 2) { if (hh + vv >= 1) 7 else 6 }
      else if (d == 1) { if (hh + vv >= 2) 5 else if (hh + vv == 1) 4 else 3 }
      else { if (hh + vv >= 2) 2 else if (hh + vv == 1) 1 else 0 }
    } else {
      if (hh == 2) 8
      else if (hh == 1) { if (vv >= 1) 7 else if (d >= 1) 6 else 5 }
      else if (vv == 2) 4
      else if (vv == 1) 3
      else if (d >= 2) 2
      else if (d == 1) 1
      else 0
    }
  }

  /** Sign-coding (ctx | xorBit << 8) from clamped H and V contributions
    * (Table D.3), pre-packed so the per-coefficient hot path allocates
    * nothing: index (hc+1)*3 + (vc+1). */
  private val ScPacked: Array[Int] = {
    val t = new Array[Int](9)
    def put(hc: Int, vc: Int, ctx: Int, xor: Int): Unit =
      t((hc + 1) * 3 + (vc + 1)) = ctx | (xor << 8)
    put(1, 1, 13, 0); put(1, 0, 12, 0); put(1, -1, 11, 0)
    put(0, 1, 10, 0); put(0, 0, 9, 0); put(0, -1, 10, 1)
    put(-1, 1, 11, 1); put(-1, 0, 12, 1); put(-1, -1, 13, 1)
    t
  }

  /** Per-code-block coder state shared by encode and decode: sigma,
    * sign, first-refinement and this-plane-visited flags. The neighbor
    * queries return PACKED ints (h | v<<4 | d<<8; ctx | xor<<8) —
    * these run once per coefficient per pass, so boxed tuples here
    * dominate the whole codec's allocation profile. */
  private final class CbState(val w: Int, val h: Int) {
    val sig = new Array[Boolean](w * h)
    val neg = new Array[Boolean](w * h)
    val refined = new Array[Boolean](w * h) // coded at least one MR pass
    val visited = new Array[Boolean](w * h) // coded in current plane's SPP
    // incrementally maintained packed neighbor counts (h | v<<4 | d<<8),
    // padded one cell on every side so border updates need no bounds
    // checks — counts are READ ~3x per coefficient per bitplane but only
    // WRITTEN once per significance event, so the classic T1 flags trick
    // turns the hottest query into one array load
    private val stride = w + 2
    private val nb = new Array[Int](stride * (h + 2))

    @inline def countsPacked(x: Int, y: Int): Int = nb((y + 1) * stride + (x + 1))

    /** Mark (x, y) significant with the given sign and bump all eight
      * neighbors' counts (pad cells absorb border spill). */
    def setSig(x: Int, y: Int, negative: Boolean): Unit = {
      val idx = y * w + x
      sig(idx) = true
      neg(idx) = negative
      val c = (y + 1) * stride + (x + 1)
      nb(c - 1) += 1
      nb(c + 1) += 1
      nb(c - stride) += 1 << 4
      nb(c + stride) += 1 << 4
      nb(c - stride - 1) += 1 << 8
      nb(c - stride + 1) += 1 << 8
      nb(c + stride - 1) += 1 << 8
      nb(c + stride + 1) += 1 << 8
    }

    @inline private def sgn(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h || !sig(y * w + x)) 0
      else if (neg(y * w + x)) -1 else 1

    /** ctx | xorBit << 8 sign-coding context (once per significance
      * event — the bounds-checked reads are off the hot path). */
    def signCtxPacked(x: Int, y: Int): Int = {
      val hc = math.max(-1, math.min(1, sgn(x - 1, y) + sgn(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgn(x, y - 1) + sgn(x, y + 1)))
      ScPacked((hc + 1) * 3 + (vc + 1))
    }
  }

  /** No-boxing visitor interfaces for the stripe/cleanup scans:
    * Function3 would box every argument per coefficient. Each has two
    * implementations (encode, decode) — bimorphic call sites. */
  private trait CbVisit { def visit(x: Int, y: Int, runMode: Boolean): Unit }
  private trait RunDecide { def decide(x: Int, yTop: Int): Int }

  /** Encode one code-block. `mag`/`negIn`: magnitudes and signs.
    * Returns (bytes, numPasses, zeroBitplanes given Mb). */
  private def encodeCb(band: Int, w: Int, h: Int, mag: Array[Int],
      negIn: Array[Boolean], mb: Int): (Array[Byte], Int, Int) = {
    var maxM = 0
    var i = 0
    while (i < mag.length) { if (mag(i) > maxM) maxM = mag(i); i += 1 }
    val nbps = if (maxM == 0) 0 else 32 - Integer.numberOfLeadingZeros(maxM)
    require(nbps <= mb, s"jpeg2000: magnitude needs $nbps bitplanes, Mb=$mb")
    if (nbps == 0) return (Array.empty[Byte], 0, mb)
    val zbp = mb - nbps
    val st = new CbState(w, h)
    val mq = new MqEncoder
    val numPasses = 3 * nbps - 2

    var plane = nbps - 1
    var first = true
    while (plane >= 0) {
      val pl = plane
      if (!first) {
        // significance propagation pass
        stripeScan(w, h) { (x, y) =>
          val idx = y * w + x
          if (!st.sig(idx)) {
            val p = st.countsPacked(x, y)
            if (p != 0) {
              val b = (mag(idx) >> pl) & 1
              mq.encode(b, zcCtx(band, p & 0xF, (p >> 4) & 0xF, p >> 8))
              if (b == 1) {
                val sp = st.signCtxPacked(x, y)
                mq.encode((if (negIn(idx)) 1 else 0) ^ (sp >> 8), sp & 0xFF)
                st.setSig(x, y, negIn(idx))
              }
              st.visited(idx) = true
            }
          }
        }
        // magnitude refinement pass
        stripeScan(w, h) { (x, y) =>
          val idx = y * w + x
          if (st.sig(idx) && !st.visited(idx)) {
            val cx = if (!st.refined(idx)) {
              if (st.countsPacked(x, y) != 0) 15 else 14
            } else 16
            mq.encode((mag(idx) >> pl) & 1, cx)
            st.refined(idx) = true
          }
        }
      }
      // cleanup pass
      val visit = new CbVisit {
        def visit(x: Int, y: Int, runMode: Boolean): Unit = {
          val idx = y * w + x
          if (runMode) {
            // caller coded the run-length bit; here the implied-1
            // coefficient's SIGN only
            val sp = st.signCtxPacked(x, y)
            mq.encode((if (negIn(idx)) 1 else 0) ^ (sp >> 8), sp & 0xFF)
            st.setSig(x, y, negIn(idx))
          } else if (!st.sig(idx) && !st.visited(idx)) {
            val p = st.countsPacked(x, y)
            val b = (mag(idx) >> pl) & 1
            mq.encode(b, zcCtx(band, p & 0xF, (p >> 4) & 0xF, p >> 8))
            if (b == 1) {
              val sp = st.signCtxPacked(x, y)
              mq.encode((if (negIn(idx)) 1 else 0) ^ (sp >> 8), sp & 0xFF)
              st.setSig(x, y, negIn(idx))
            }
          }
        }
      }
      val decide = new RunDecide {
        def decide(x: Int, yTop: Int): Int = {
          // run-length decision for an eligible all-clear 4-column: does
          // a 1-bit appear in this plane within the column?
          var firstOne = -1
          var k = 0
          while (k < 4 && firstOne < 0) {
            if (((mag((yTop + k) * w + x) >> pl) & 1) == 1) firstOne = k
            k += 1
          }
          if (firstOne < 0) { mq.encode(0, CtxRL); -1 }
          else {
            mq.encode(1, CtxRL)
            mq.encode((firstOne >> 1) & 1, CtxUNI)
            mq.encode(firstOne & 1, CtxUNI)
            firstOne
          }
        }
      }
      cleanupScan(w, h, st, visit, decide)
      java.util.Arrays.fill(st.visited, false)
      first = false
      plane -= 1
    }
    (mq.flush(), numPasses, zbp)
  }

  /** Decode one code-block coded with `numPasses` starting at bitplane
    * mb-1-zbp. Returns (magnitudes, signs). */
  private def decodeCb(band: Int, w: Int, h: Int, data: Array[Byte],
      numPasses: Int, mb: Int, zbp: Int): (Array[Int], Array[Boolean]) = {
    val mag = new Array[Int](w * h)
    val neg = new Array[Boolean](w * h)
    if (numPasses == 0) return (mag, neg)
    val st = new CbState(w, h)
    val mq = new MqDecoder(data)
    val nbps = mb - zbp
    var plane = nbps - 1
    var passesLeft = numPasses
    var first = true
    while (plane >= 0 && passesLeft > 0) {
      val pl = plane
      if (!first) {
        if (passesLeft > 0) { // significance propagation
          stripeScan(w, h) { (x, y) =>
            val idx = y * w + x
            if (!st.sig(idx)) {
              val p = st.countsPacked(x, y)
              if (p != 0) {
                if (mq.decode(zcCtx(band, p & 0xF, (p >> 4) & 0xF, p >> 8)) == 1) {
                  val sp = st.signCtxPacked(x, y)
                  val s = mq.decode(sp & 0xFF) ^ (sp >> 8)
                  st.setSig(x, y, s == 1)
                  mag(idx) |= 1 << pl
                  neg(idx) = s == 1
                }
                st.visited(idx) = true
              }
            }
          }
          passesLeft -= 1
        }
        if (passesLeft > 0) { // magnitude refinement
          stripeScan(w, h) { (x, y) =>
            val idx = y * w + x
            if (st.sig(idx) && !st.visited(idx)) {
              val cx = if (!st.refined(idx)) {
                if (st.countsPacked(x, y) != 0) 15 else 14
              } else 16
              if (mq.decode(cx) == 1) mag(idx) |= 1 << pl
              st.refined(idx) = true
            }
          }
          passesLeft -= 1
        }
      }
      if (passesLeft > 0) { // cleanup
        val visit = new CbVisit {
          def visit(x: Int, y: Int, runMode: Boolean): Unit = {
            val idx = y * w + x
            if (runMode) {
              val sp = st.signCtxPacked(x, y)
              val s = mq.decode(sp & 0xFF) ^ (sp >> 8)
              st.setSig(x, y, s == 1)
              mag(idx) |= 1 << pl
              neg(idx) = s == 1
            } else if (!st.sig(idx) && !st.visited(idx)) {
              val p = st.countsPacked(x, y)
              if (mq.decode(zcCtx(band, p & 0xF, (p >> 4) & 0xF, p >> 8)) == 1) {
                val sp = st.signCtxPacked(x, y)
                val s = mq.decode(sp & 0xFF) ^ (sp >> 8)
                st.setSig(x, y, s == 1)
                mag(idx) |= 1 << pl
                neg(idx) = s == 1
              }
            }
          }
        }
        val decide = new RunDecide {
          def decide(x: Int, yTop: Int): Int =
            if (mq.decode(CtxRL) == 0) -1
            else (mq.decode(CtxUNI) << 1) | mq.decode(CtxUNI)
        }
        cleanupScan(w, h, st, visit, decide)
        passesLeft -= 1
      }
      java.util.Arrays.fill(st.visited, false)
      first = false
      plane -= 1
    }
    (mag, neg)
  }

  /** Stripe scan: 4-row stripes, column-major within a stripe. */
  private def stripeScan(w: Int, h: Int)(f: (Int, Int) => Unit): Unit = {
    var y0 = 0
    while (y0 < h) {
      var x = 0
      while (x < w) {
        var k = 0
        while (k < 4 && y0 + k < h) { f(x, y0 + k); k += 1 }
        x += 1
      }
      y0 += 4
    }
  }

  /** Cleanup scan with run-length mode: a full 4-column whose members
    * are all insignificant, unvisited, and neighbor-free enters run
    * mode — `runDecision(x, yTop)` codes/decodes the RL bit (+ position
    * on a broken run) and returns the first-significant offset or -1;
    * coefficients after that offset (and every non-run column) go
    * through `f(x, y, runMode)` where runMode marks the single broken
    * coefficient whose magnitude bit is implied 1 (sign only). */
  private def cleanupScan(w: Int, h: Int, st: CbState,
      f: CbVisit, runDecision: RunDecide): Unit = {
    var y0 = 0
    while (y0 < h) {
      var x = 0
      while (x < w) {
        val fullStripe = y0 + 3 < h
        var eligible = fullStripe
        if (eligible) {
          var k = 0
          while (k < 4 && eligible) {
            val y = y0 + k
            val idx = y * w + x
            if (st.sig(idx) || st.visited(idx)) eligible = false
            else if (st.countsPacked(x, y) != 0) eligible = false
            k += 1
          }
        }
        if (eligible) {
          val firstOne = runDecision.decide(x, y0)
          if (firstOne >= 0) {
            f.visit(x, y0 + firstOne, true) // implied-1: sign only
            var k = firstOne + 1
            while (k < 4) { f.visit(x, y0 + k, false); k += 1 }
          }
        } else {
          var k = 0
          while (k < 4 && y0 + k < h) { f.visit(x, y0 + k, false); k += 1 }
        }
        x += 1
      }
      y0 += 4
    }
  }

  private[sources] final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nBits = 0
    private var lastByte = 0
    def bit(): Int = {
      if (nBits == 0) {
        val limit = if (lastByte == 0xFF) 7 else 8
        lastByte = if (pos < data.length) data(pos) & 0xFF else 0
        pos += 1
        cur = lastByte
        nBits = limit
        if (limit == 7) cur &= 0x7F
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Advance to the byte boundary (consuming the stuffing byte the
      * writer emits after a trailing 0xFF). */
    def align(): Int = {
      val wasFF = lastByte == 0xFF
      nBits = 0
      lastByte = 0
      if (wasFF) pos += 1
      pos
    }
  }

  // =====================================================================
  // Tier-2 geometry: single tile at origin, so at decomposition step l
  // the low band is ceil(n / 2^l) wide and the high band fills the rest.
  // Bands per resolution: r=0 -> LL(NL); r>0 -> HL/LH/HH at level
  // l = NL - r + 1. Code-blocks tile each band from its own origin.
  // =====================================================================

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b
  private def lowLen(n: Int, l: Int): Int = {
    var v = n
    var i = 0
    while (i < l) { v = (v + 1) / 2; i += 1 }
    v
  }

  /** (band, w, h, xOff, yOff) of each subband of resolution r inside the
    * transformed plane's quadrant layout. */
  private def bandsOf(w: Int, h: Int, nl: Int, r: Int): Seq[(Int, Int, Int, Int, Int)] =
    if (r == 0) Seq((0, lowLen(w, nl), lowLen(h, nl), 0, 0))
    else {
      val l = nl - r + 1 // decomposition level of these bands
      val lw = lowLen(w, l); val lh = lowLen(h, l)
      val pw = lowLen(w, l - 1); val ph = lowLen(h, l - 1)
      val hw = pw - lw; val hh = ph - lh
      Seq(
        (1, hw, lh, lw, 0),  // HL right of LL
        (2, lw, hh, 0, lh),  // LH below LL
        (3, hw, hh, lw, lh)) // HH diagonal
        .filter(b => b._2 > 0 && b._3 > 0)
    }

  /** Per-code-block record used by both directions. */
  private final case class CbRec(band: Int, w: Int, h: Int,
      xOff: Int, yOff: Int, gx: Int, gy: Int)

  private def cbGrid(bw: Int, bh: Int, cb: Int): (Int, Int) =
    (math.max(1, ceilDiv(bw, cb)), math.max(1, ceilDiv(bh, cb)))

  // =====================================================================
  // Precincts, progression orders, quality layers (Annex B.6 / B.12)
  // =====================================================================

  /** One packet identity: (layer, resolution, component, precinct).
    * `pix`/`piy` index the precinct grid of resolution `r`; `p` is the
    * raster precinct number piy * npx + pix used by LRCP/RLCP. */
  private final case class PktId(l: Int, r: Int, c: Int,
      pix: Int, piy: Int, p: Int)

  /** Precinct grid dimensions of resolution `r` over a tile: the
    * resolution plane (lowLen at nl - r) partitioned by 2^ppx x 2^ppy
    * cells anchored at 0 (the tile grid carries no canvas offset here,
    * so precinct origins are exact multiples). Never 0x0: the resolution
    * plane of a non-empty tile is at least 1x1. */
  private def precGridOf(tcw: Int, tch: Int, nl: Int, r: Int,
      ppx: Int, ppy: Int): (Int, Int) = {
    val rw = lowLen(tcw, nl - r)
    val rh = lowLen(tch, nl - r)
    (math.max(1, ceilDiv(rw, 1 << ppx)), math.max(1, ceilDiv(rh, 1 << ppy)))
  }

  /** Subband geometry extended with the precinct-capped EFFECTIVE
    * code-block dimensions (B.7: xcb' = min(xcb, PPx) at r = 0, min(xcb,
    * PPx - 1) above — band coordinates are half the resolution's) and
    * the resulting code-block grid. With maximal precincts (PPx = PPy =
    * 15) this degenerates to the plain square-cb grid. */
  private final case class BandGeom(band: Int, bw: Int, bh: Int,
      xOff: Int, yOff: Int, cbw: Int, cbh: Int, gw: Int, gh: Int,
      sx: Int, sy: Int) {
    /** Code-block index rectangle [gx0, gx1) x [gy0, gy1) of precinct
      * (pix, piy) inside this band — possibly empty (band smaller than
      * the precinct cover). Precinct origins are multiples of the
      * effective cb size, so the global grid respects the boundary. */
    def cbRect(pix: Int, piy: Int): (Int, Int, Int, Int) = {
      val px0 = math.min(pix.toLong << sx, bw.toLong).toInt
      val px1 = math.min((pix + 1).toLong << sx, bw.toLong).toInt
      val py0 = math.min(piy.toLong << sy, bh.toLong).toInt
      val py1 = math.min((piy + 1).toLong << sy, bh.toLong).toInt
      (px0 / cbw, py0 / cbh, ceilDiv(px1, cbw), ceilDiv(py1, cbh))
    }
  }

  private def bandGeoms(tcw: Int, tch: Int, nl: Int, r: Int, cbExp: Int,
      ppx: Int, ppy: Int): Seq[BandGeom] = {
    val sx = math.min(30, if (r == 0) ppx else ppx - 1)
    val sy = math.min(30, if (r == 0) ppy else ppy - 1)
    val cbw = math.min(1 << cbExp, 1 << sx)
    val cbh = math.min(1 << cbExp, 1 << sy)
    bandsOf(tcw, tch, nl, r).map { case (band, bw, bh, xOff, yOff) =>
      BandGeom(band, bw, bh, xOff, yOff, cbw, cbh,
        math.max(1, ceilDiv(bw, cbw)), math.max(1, ceilDiv(bh, cbh)), sx, sy)
    }
  }

  /** The tile's packet sequence in the signalled progression order
    * (Table B.12). Position-driven orders (RPCL/PCRL/CPRL) compare the
    * precinct origin in full-resolution canvas coordinates — with
    * anchored grids and no subsampling this sort is exactly the spec's
    * position-sampling loops. Both directions iterate this one sequence,
    * so packet order is consistent by construction. */
  private def packetSeq(order: Int, layers: Int, nc: Int, nlOf: Int => Int,
      dims: Int => (Int, Int), pp: (Int, Int) => (Int, Int),
      ss: Int => (Int, Int) = _ => (1, 1)): IndexedSeq[PktId] = {
    // pp is (resolution, component) -> precinct exponents: a COC override
    // gives components their own precinct grids, so the precinct count
    // varies per (r, c) — generation order is irrelevant (sorted below).
    // nlOf and dims are PER COMPONENT (COC level overrides shrink one
    // component's pyramid; SIZ subsampling shrinks its tile plane):
    // packets exist only for r <= nlOf(c), grids come from the
    // component's own plane, and position-driven orders scale precinct
    // origins by the subsampling back to CANVAS coordinates.
    val nlMax = (0 until nc).map(nlOf).max
    val all = for {
      r <- 0 to nlMax
      c <- 0 until nc
      if r <= nlOf(c)
      (ppx, ppy) = pp(r, c)
      (tcw, tch) = dims(c)
      (npx, npy) = precGridOf(tcw, tch, nlOf(c), r, ppx, ppy)
      l <- 0 until layers
      piy <- 0 until npy
      pix <- 0 until npx
    } yield PktId(l, r, c, pix, piy, piy * npx + pix)
    def pos(k: PktId): (Long, Long) = {
      val (ppx, ppy) = pp(k.r, k.c)
      val (sx, sy) = ss(k.c)
      ((k.piy.toLong << (ppy + nlOf(k.c) - k.r)) * sy,
        (k.pix.toLong << (ppx + nlOf(k.c) - k.r)) * sx)
    }
    order match {
      case 0 => all.sortBy(k => (k.l, k.r, k.c, k.p))
      case 1 => all.sortBy(k => (k.r, k.l, k.c, k.p))
      case 2 => all.sortBy { k => val (py, px) = pos(k); (k.r, py, px, k.c, k.l) }
      case 3 => all.sortBy { k => val (py, px) = pos(k); (py, px, k.c, k.r, k.l) }
      case 4 => all.sortBy { k => val (py, px) = pos(k); (k.c, py, px, k.r, k.l) }
      case o => throw new IllegalArgumentException(
        s"jpeg2000: unknown progression order $o")
    }
  }

  /** POC-aware packet sequence: with no POC segments this is exactly
    * [[packetSeq]] in the COD order; with POC (A.6.6 / B.12) the
    * progression is the CONCATENATION of the segments — each iterates
    * its own order over layers < LYEpoc, RSpoc <= r < REpoc, CSpoc <= c
    * < CEpoc — deduplicated in arrival order (a packet already placed by
    * an earlier segment is not re-emitted). Encoder and decoder share
    * this one function, so packet order is consistent by construction;
    * a POC whose segments do not cover every packet refuses loudly. */
  private def packetSeqOf(order: Int, poc: Seq[(Int, Int, Int, Int, Int, Int)],
      layers: Int, nc: Int, nlOf: Int => Int,
      dims: Int => (Int, Int), pp: (Int, Int) => (Int, Int),
      ss: Int => (Int, Int) = _ => (1, 1)): IndexedSeq[PktId] = {
    val base = packetSeq(order, layers, nc, nlOf, dims, pp, ss)
    if (poc.isEmpty) base
    else {
      val seen = scala.collection.mutable.HashSet.empty[PktId]
      val out = new ArrayBuffer[PktId](base.length)
      poc.foreach { case (rs, cs, lye, re, ce, ppoc) =>
        packetSeq(ppoc, layers, nc, nlOf, dims, pp, ss).foreach { k =>
          if (k.l < lye && k.r >= rs && k.r < re && k.c >= cs && k.c < ce &&
              seen.add(k))
            out += k
        }
      }
      require(out.length == base.length,
        s"jpeg2000: POC segments cover ${out.length} of ${base.length} " +
          "packets — incomplete progression unsupported")
      out.toIndexedSeq
    }
  }

  /** True when every packet of resolutions 0..rMax precedes every packet
    * of higher resolutions — the property that makes a leading-prefix
    * fetch sufficient for a reduced-resolution decode. Holds for RLCP
    * and RPCL always, and for LRCP with a single layer. */
  private def resolutionMajor(order: Int, layers: Int): Boolean =
    order == 1 || order == 2 || (order == 0 && layers == 1)

  /** Split a code-block's `np` coding passes and `nbytes` codeword bytes
    * into per-layer contributions: passes spread evenly (cumulative
    * boundary at round(np * (l+1) / layers)), bytes proportionally to
    * passes. The codeword is ONE MQ stream (default code-block style),
    * so any byte split that the decoder re-concatenates in layer order
    * reproduces it exactly. */
  private def layerSplit(np: Int, nbytes: Int, layers: Int): Array[(Int, Int)] =
    if (np == 0) Array.fill(layers)((0, 0))
    else Array.tabulate(layers) { l =>
      val p0 = (l.toLong * np / layers).toInt
      val p1 = ((l + 1).toLong * np / layers).toInt
      val b0 = if (p0 == np) nbytes else (p0.toLong * nbytes / np).toInt
      val b1 = if (p1 == np) nbytes else (p1.toLong * nbytes / np).toInt
      (p1 - p0, b1 - b0)
    }

  /** Pass-count codeword (Table B.4). */
  private def writePassCount(bwr: BitWriter, n: Int): Unit = n match {
    case 1 => bwr.bit(0)
    case 2 => bwr.bits(0x2, 2)
    case k if k <= 5 => bwr.bits(0x3, 2); bwr.bits(k - 3, 2)
    case k if k <= 36 => bwr.bits(0xF, 4); bwr.bits(k - 6, 5)
    case k => bwr.bits(0x1FF, 9); bwr.bits(k - 37, 7)
  }

  private def readPassCount(br: BitReader): Int = {
    if (br.bit() == 0) 1
    else if (br.bit() == 0) 2
    else {
      val two = br.bits(2)
      if (two < 3) 3 + two
      else {
        val five = br.bits(5)
        if (five < 31) 6 + five
        else 37 + br.bits(7)
      }
    }
  }

  // =====================================================================
  // Public API
  // =====================================================================

  /** Encode planes (same dimensions) as a raw .j2k codestream.
    * `mct = true` applies the REVERSIBLE COLOR TRANSFORM (RCT, Annex
    * G.2) to the first three components — the lossless-profile
    * decorrelation openjpeg/GDAL apply to RGB by default; requires
    * exactly 3 components of one depth/signedness. `tileSize` splits the
    * image into an independently-coded tile grid (SOT per tile, TLM in
    * the main header so a reader can locate tile-parts without scanning)
    * — the layout real Sentinel-2-class granules use; tile dimensions
    * must be multiples of 2^levels so every tile starts at even parity
    * at every decomposition level (the canvas-coordinate rule F.2).
    *
    * `qstep > 0` selects the LOSSY path: irreversible 9/7 DWT (Annex F)
    * + scalar quantization (Annex E) with a uniform requested step of
    * `qstep` sample units per subband, signalled per subband as Sqcd
    * style-2 (ε, μ) words — the encoder quantizes with the SIGNALLED
    * step so decode reconstructs on exactly the grid the stream
    * declares. With `mct` the lossy path applies the irreversible ICT
    * (floating YCbCr) instead of the RCT. One quality layer: qstep IS
    * the rate knob (quicklook archives; no ROI/precinct rate control). */
  def encode(planes: Seq[Plane], levels: Int = 5, cbExp: Int = 6,
      mct: Boolean = false, tileSize: Option[(Int, Int)] = None,
      qstep: Double = 0.0, layers: Int = 1, order: Int = 0,
      precinct: Option[(Int, Int)] = None, sopEph: Boolean = false,
      partsPerResolution: Boolean = false,
      derivedQuant: Boolean = false,
      cocCbExp: Map[Int, Int] = Map.empty,
      cocPrecinct: Map[Int, (Int, Int)] = Map.empty,
      cocLevels: Map[Int, Int] = Map.empty,
      cocTransform: Map[Int, Int] = Map.empty,
      subsampling: Map[Int, (Int, Int)] = Map.empty,
      poc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
      packedHeaders: Int = 0,
      roi: Map[Int, (Int, Int, Int, Int)] = Map.empty,
      pocInTilePart: Boolean = false,
      rgnInTilePart: Boolean = false): Array[Byte] = {
    val lossy = qstep > 0.0
    // POC (A.6.6): ordered (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc)
    // segments replacing the COD progression; the shared packetSeqOf
    // guarantees encode/decode agree, and refuses incomplete coverage.
    poc.foreach { case (rs, cs, lye, re, ce, pp) =>
      require(pp >= 0 && pp <= 4 && re > rs && ce > cs && lye >= 1 &&
        rs >= 0 && cs >= 0,
        s"jpeg2000: bad POC segment ($rs,$cs,$lye,$re,$ce,$pp)")
    }
    require(poc.isEmpty || !partsPerResolution,
      "jpeg2000: POC with per-resolution tile-parts unsupported")
    require(!pocInTilePart || poc.nonEmpty,
      "jpeg2000: pocInTilePart without POC segments")
    require(!rgnInTilePart || roi.nonEmpty,
      "jpeg2000: rgnInTilePart without ROI rects")
    // PPM (1) / PPT (2): packet headers relocated to the main header /
    // tile-part header; bodies (and SOP markers) stay in the bitstream
    require(packedHeaders >= 0 && packedHeaders <= 2,
      s"jpeg2000: packedHeaders $packedHeaders (0 none, 1 PPM, 2 PPT)")
    require(packedHeaders == 0 || !partsPerResolution,
      "jpeg2000: packed headers with per-resolution tile-parts unsupported")
    require(!derivedQuant || lossy,
      "jpeg2000: derivedQuant is a lossy-path (qstep > 0) option")
    cocCbExp.foreach { case (c, e) =>
      require(c >= 0 && c < planes.length && e >= 2 && e <= 10,
        s"jpeg2000: COC code-block override out of range: comp $c exp $e")
    }
    cocPrecinct.foreach { case (c, (px, py)) =>
      require(c >= 0 && c < planes.length &&
        px >= 1 && px <= 15 && py >= 1 && py <= 15,
        s"jpeg2000: COC precinct override out of range: comp $c ($px,$py)")
    }
    // per-component decomposition-level / wavelet-transform overrides
    // (COC SPcoc bytes 0 and 4): a transform-0 (9/7) component inside a
    // stream needs the quantizer step, so any 9/7 override requires
    // qstep > 0 (which also makes 9/7 the COD default — mixed streams
    // signal the 5/3 components as the overrides, with style-0 QCCs)
    cocTransform.foreach { case (c, t) =>
      require(c >= 0 && c < planes.length && (t == 0 || t == 1),
        s"jpeg2000: COC transform override out of range: comp $c tr $t")
    }
    require(cocTransform.values.forall(_ == 1) || lossy,
      "jpeg2000: a 9/7 component override needs qstep > 0")
    require(cocTransform.isEmpty || !mct,
      "jpeg2000: MCT couples components 0-2 through one transform; " +
        "per-component transform overrides are incompatible with it")
    require((cocTransform.isEmpty && cocLevels.isEmpty) ||
        (!derivedQuant && !partsPerResolution),
      "jpeg2000: level/transform overrides with derivedQuant or " +
        "per-resolution tile-parts unsupported")
    require(planes.nonEmpty, "jpeg2000: no components")
    require(layers >= 1 && layers <= 1000, "jpeg2000: layers must be 1..1000")
    require(order >= 0 && order <= 4,
      "jpeg2000: progression order 0..4 (LRCP/RLCP/RPCL/PCRL/CPRL)")
    require(!partsPerResolution || order == 1 || order == 2,
      "jpeg2000: per-resolution tile-parts need a resolution-major " +
        "progression (RLCP or RPCL)")
    precinct.foreach { case (px, py) =>
      require(px >= 1 && px <= 15 && py >= 1 && py <= 15,
        "jpeg2000: precinct exponents must be 1..15")
    }
    // component subsampling (SIZ XRsiz/YRsiz): component c samples the
    // reference canvas every (ssx, ssy) pixels — the 4:2:0 chroma shape
    // of real Sentinel-2 JP2s. Component 0 anchors the canvas (ss 1,1);
    // every other plane must arrive at ceil(canvas / ss). Kept
    // single-tile and MCT-free (the RCT/ICT couples equal-size planes).
    val ssOf: Int => (Int, Int) = c => subsampling.getOrElse(c, (1, 1))
    subsampling.foreach { case (c, (sx, sy)) =>
      require(c >= 0 && c < planes.length &&
        sx >= 1 && sx <= 255 && sy >= 1 && sy <= 255,
        s"jpeg2000: subsampling out of range: comp $c ($sx,$sy)")
    }
    val subsampled = planes.indices.exists(c => ssOf(c) != ((1, 1)))
    require(!subsampled || ssOf(0) == ((1, 1)),
      "jpeg2000: component 0 anchors the canvas (subsampling must be 1,1)")
    require(!subsampled || (!mct && tileSize.isEmpty &&
        !partsPerResolution && !derivedQuant),
      "jpeg2000: subsampling with MCT, tiling, per-resolution tile-parts " +
        "or derived quantization unsupported")
    val w = planes.head.w
    val h = planes.head.h
    require(w > 0 && h > 0, "jpeg2000: empty image")
    planes.indices.foreach { c =>
      val (sx, sy) = ssOf(c)
      require(planes(c).w == ceilDiv(w, sx) && planes(c).h == ceilDiv(h, sy),
        s"jpeg2000: component $c is ${planes(c).w}x${planes(c).h}, " +
          s"expected ${ceilDiv(w, sx)}x${ceilDiv(h, sy)} for subsampling ($sx,$sy)")
    }
    require(planes.forall(p => p.depth >= 1 && p.depth <= 16),
      "jpeg2000: bit depth must be 1..16")
    require(cbExp >= 2 && cbExp <= 10, "jpeg2000: code-block exponent 2..10")
    require(!mct || (planes.length == 3 &&
      planes.map(p => (p.depth, p.signed)).distinct.size == 1),
      "jpeg2000: RCT needs exactly 3 components of one depth/signedness")
    val nl = math.max(0, math.min(levels,
      31 - Integer.numberOfLeadingZeros(math.max(1, math.min(w, h)))))
    cocLevels.foreach { case (c, l) =>
      require(c >= 0 && c < planes.length && l >= 0 && l <= nl,
        s"jpeg2000: COC level override out of range: comp $c levels $l " +
          s"(COD carries the maximum, $nl)")
    }
    def nlOfE(comp: Int): Int = cocLevels.getOrElse(comp, nl)
    def lossyOfE(comp: Int): Boolean =
      cocTransform.get(comp).map(_ == 0).getOrElse(lossy)
    val cb = 1 << cbExp
    val guard = 2
    val (tw, th) = tileSize.getOrElse((w, h))
    require(tw > 0 && th > 0, "jpeg2000: tile size must be positive")
    val multiTile = tw < w || th < h
    require(!multiTile || (tw % (1 << nl) == 0 && th % (1 << nl) == 0),
      s"jpeg2000: tile size ${tw}x$th must be a multiple of 2^levels=" +
        s"${1 << nl} (canvas parity)")
    val ntx = ceilDiv(w, tw)
    val nty = ceilDiv(h, th)

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }

    // SOC + SIZ
    u16(0xFF4F)
    u16(0xFF51)
    u16(38 + 3 * planes.length)
    u16(0) // Rsiz
    u32(w); u32(h); u32(0); u32(0)
    u32(tw); u32(th); u32(0); u32(0)
    u16(planes.length)
    planes.indices.foreach { c =>
      val p = planes(c)
      val (sx, sy) = ssOf(c)
      u8((p.depth - 1) | (if (p.signed) 0x80 else 0))
      u8(sx); u8(sy)
    }
    // COD: Scod flags custom precincts (bit 0) and SOP/EPH resync
    // markers (bits 1/2); SPcod then carries one PPx|PPy<<4 byte per
    // resolution when precincts are custom (B.12 signalling)
    val (ppxE, ppyE) = precinct.getOrElse((15, 15))
    val usePrec = precinct.isDefined
    u16(0xFF52)
    u16(12 + (if (usePrec) nl + 1 else 0))
    u8((if (usePrec) 1 else 0) | (if (sopEph) 2 | 4 else 0))
    u8(order)
    u16(layers)
    u8(if (mct) 1 else 0)
    u8(nl)
    u8(cbExp - 2); u8(cbExp - 2)
    u8(0)        // code-block style: all defaults
    u8(if (lossy) 0 else 1) // transform: 0 = 9/7 irreversible, 1 = 5/3
    if (usePrec) for (_ <- 0 to nl) u8(ppxE | (ppyE << 4))
    // per-component overrides for code-block size / precincts (COC,
    // A.6.2) — the decode-side COC surface is differential-tested by
    // emitting them from this encoder (the rs20/rs22 pattern)
    def cbExpOfE(comp: Int): Int = cocCbExp.getOrElse(comp, cbExp)
    def ppOfE(comp: Int): (Int, Int) = cocPrecinct.getOrElse(comp, (ppxE, ppyE))
    for (comp <- planes.indices
        if cocCbExp.contains(comp) || cocPrecinct.contains(comp) ||
          cocLevels.contains(comp) || cocTransform.contains(comp)) {
      val ce = cbExpOfE(comp)
      val nlc = nlOfE(comp)
      // Scoc=0 means MAXIMAL precincts for the component (A.6.2), not
      // "inherit the COD's" — so when the COD signals custom precincts,
      // every COC must carry its own precinct table (copying the COD
      // exponents when the component has no override), else the
      // signalled layout diverges from the packets.
      val hasPrec = cocPrecinct.contains(comp) || usePrec
      val (cpx, cpy) = ppOfE(comp)
      u16(0xFF53)
      u16(9 + (if (hasPrec) nlc + 1 else 0))
      u8(comp) // Ccoc (1 byte: nc < 257 always holds here)
      u8(if (hasPrec) 1 else 0) // Scoc
      u8(nlc); u8(ce - 2); u8(ce - 2); u8(0)
      u8(if (lossyOfE(comp)) 0 else 1)
      if (hasPrec) for (_ <- 0 to nlc) u8(cpx | (cpy << 4))
    }
    val depthMax = planes.map(_.depth).max
    def gainOf(band: Int): Int = band match {
      case 0 => 0
      case 3 => 2
      case _ => 1
    }
    // subband exponent: RCT expands the chroma components (1, 2) by one
    // bit (Cb = B - G, Cr = R - G span depth+1), so their exponents —
    // and with them Mb — carry the +1 the standard prescribes (G.2);
    // component 0 keeps the plain depth. (Lossless path only: the ICT
    // is float, no integer expansion.)
    def epsOf(comp: Int, band: Int): Int =
      depthMax + gainOf(band) + (if (mct && comp >= 1) 1 else 0)
    // lossy: per-subband signalled (ε, μ) for the uniform requested step
    // at the subband's dynamic-range exponent Rb = depth + gain; the
    // QUANTIZER uses the signalled step these words reconstruct to.
    // Derived mode (style 1) signals ONE (ε0, μ0) — the LL word — and
    // BOTH sides derive ε_b = ε0 + 1 − r at resolution r ≥ 1 (E.1.1),
    // so coarser resolutions quantize with progressively finer steps.
    val derivedE0M0: (Int, Int) =
      if (lossy && derivedQuant) {
        val em = stepToEpsMu(qstep, depthMax)
        require(em._1 >= nl,
          s"jpeg2000: derived quantization needs ε0 >= levels ($nl), " +
            s"got ${em._1} — use a smaller qstep or expounded signalling")
        em
      } else null
    def lossyEpsMu(r: Int, band: Int): (Int, Int) =
      if (derivedQuant) (derivedE0M0._1 + (if (r == 0) 0 else 1 - r), derivedE0M0._2)
      else stepToEpsMu(qstep, depthMax + gainOf(band))
    def stepHatEnc(r: Int, band: Int): Double = {
      val (e, m) = lossyEpsMu(r, band)
      stepOf(e, m, depthMax + gainOf(band))
    }
    // RGN maxshift (E.1): ROI coefficients scale UP by SPrgn = the
    // component's largest Mb — every background coefficient fits its
    // band's Mb bits, so it stays < 2^SPrgn and the decoder's
    // magnitude test separates the sets exactly. Reversible (5/3)
    // components only: a quantized ROI has no bit-exact contract.
    val roiS: Map[Int, Int] = roi.map { case (c, rect) =>
      require(c >= 0 && c < planes.length, s"jpeg2000: ROI component $c")
      require(!lossyOfE(c),
        s"jpeg2000: ROI on a 9/7 (lossy) component $c unsupported")
      val (rx0, ry0, rw0, rh0) = rect
      require(rw0 > 0 && rh0 > 0 && rx0 >= 0 && ry0 >= 0 &&
        rx0 + rw0 <= planes(c).w && ry0 + rh0 <= planes(c).h,
        s"jpeg2000: ROI rect $rect outside component $c plane")
      val s = epsOf(c, 3) + guard - 1
      require(s + epsOf(c, 3) + guard - 1 <= 30,
        s"jpeg2000: ROI shift $s overflows 32-bit magnitudes " +
          "(component depth too large for maxshift)")
      c -> s
    }
    def mbOf(comp: Int, r: Int, band: Int): Int =
      (if (lossyOfE(comp)) lossyEpsMu(r, band)._1 else epsOf(comp, band)) +
        guard - 1 + roiS.getOrElse(comp, 0)
    if (lossy && derivedQuant) {
      // QCD style 1 (scalar derived): a single 16-bit (ε0 << 11 | μ0)
      u16(0xFF5C)
      u16(5)
      u8((guard << 5) | 1)
      u16((derivedE0M0._1 << 11) | derivedE0M0._2)
    } else if (lossy) {
      // QCD style 2 (scalar expounded): 16-bit (ε << 11 | μ) per subband
      u16(0xFF5C)
      u16(3 + 2 * (1 + 3 * nl))
      u8((guard << 5) | 2)
      val (e0, m0) = lossyEpsMu(0, 0)
      u16((e0 << 11) | m0)
      for (r <- 1 to nl; b <- Seq(1, 2, 3)) {
        val (e, m) = lossyEpsMu(r, b)
        u16((e << 11) | m)
      }
    } else {
      // QCD: no quantization, exponents only; Mb = eps + guard - 1
      u16(0xFF5C)
      u16(4 + 3 * nl)
      u8(guard << 5) // Sqcd: style 0 (no quantization)
      u8(epsOf(0, 0) << 3)
      for (r <- 1 to nl; b <- Seq(1, 2, 3)) u8(epsOf(0, b) << 3)
    }
    // QCC for every component the global QCD does not describe: the RCT
    // chroma components (+1 exponents), any component whose transform
    // differs from the COD's (style flips between 0/no-quant and 2/
    // expounded), and any component whose level override changes the
    // subband table length
    def writeQcc(comp: Int): Unit = {
      val nlc = nlOfE(comp)
      if (lossyOfE(comp)) {
        u16(0xFF5D)
        u16(4 + 2 * (1 + 3 * nlc))
        u8(comp)                // Cqcc (1 byte: nc < 257 always holds)
        u8((guard << 5) | 2)    // Sqcc: scalar expounded
        val (e0, m0) = lossyEpsMu(0, 0)
        u16((e0 << 11) | m0)
        for (r <- 1 to nlc; b <- Seq(1, 2, 3)) {
          val (e, m) = lossyEpsMu(r, b)
          u16((e << 11) | m)
        }
      } else {
        u16(0xFF5D)
        u16(5 + 3 * nlc)
        u8(comp)
        u8(guard << 5)          // Sqcc: style 0 (no quantization)
        u8(epsOf(comp, 0) << 3)
        for (r <- 1 to nlc; b <- Seq(1, 2, 3)) u8(epsOf(comp, b) << 3)
      }
    }
    for (comp <- planes.indices
        if lossyOfE(comp) != lossy || nlOfE(comp) != nl ||
          (!lossy && epsOf(comp, 0) != epsOf(0, 0)))
      writeQcc(comp)
    // POC (A.6.6): 7-byte entries (nc < 257 always holds here); with
    // pocInTilePart the marker moves into each tile-part header instead
    if (poc.nonEmpty && !pocInTilePart) {
      u16(0xFF5F)
      u16(2 + 7 * poc.length)
      poc.foreach { case (rs, cs, lye, re, ce, pp) =>
        u8(rs); u8(cs); u16(lye); u8(re); u8(math.min(ce, 255)); u8(pp)
      }
    }
    // RGN (A.6.3): one marker per ROI component, Srgn = 0 (maxshift);
    // with rgnInTilePart the markers move into each tile-part header
    if (!rgnInTilePart) roiS.toSeq.sortBy(_._1).foreach { case (c, s) =>
      u16(0xFF5E)
      u16(5)
      u8(c); u8(0); u8(s)
    }

    // ---- per-tile encoding (tiles are independently coded) ----
    def encodeTile(tx0: Int, ty0: Int, tcw: Int, tch: Int)
        : (Array[Byte], Array[Byte], ArrayBuffer[Int]) = {
      val body = new java.io.ByteArrayOutputStream()
      // packedHeaders: packet headers (and their EPH) collect here
      // instead of the bitstream; SOP markers and bodies stay in-stream
      val hdrOut = new java.io.ByteArrayOutputStream()
      // per-component tile plane: the component's own (subsampled) dims —
      // subsampling forces single-tile, so the plane IS the whole
      // component and tx0/ty0 are 0 there
      def tdims(c: Int): (Int, Int) =
        if (subsampled) (planes(c).w, planes(c).h) else (tcw, tch)
      // ROI support rects per level, tile-local component coords — the
      // SAME margin-4 halving recursion the windowed decoder uses for
      // its needed-coefficient sets (a superset of the true influence
      // set, which is all maxshift legality requires)
      val roiRects: Map[Int, Array[(Int, Int, Int, Int)]] =
        roiS.keys.map { c =>
          val (rx, ry, rw2, rh2) = roi(c)
          val ox = if (subsampled) 0 else tx0
          val oy = if (subsampled) 0 else ty0
          val (cw, ch) = tdims(c)
          val x0 = math.max(0, rx - ox); val y0 = math.max(0, ry - oy)
          val x1 = math.min(cw, rx + rw2 - ox)
          val y1 = math.min(ch, ry + rh2 - oy)
          val nlc = nlOfE(c)
          val rects = new Array[(Int, Int, Int, Int)](nlc + 1)
          rects(0) = (x0, y0, x1, y1)
          var l = 1
          while (l <= nlc) {
            val (a, b2, c2, d2) = rects(l - 1)
            rects(l) = (a / 2 - 4, b2 / 2 - 4, (c2 + 1) / 2 + 4, (d2 + 1) / 2 + 4)
            l += 1
          }
          c -> rects
        }.toMap
      // DC level shift the tile's sub-rect of every component, then the
      // optional RCT across the first three (forward: Y=(R+2G+B)>>2,
      // Cb=B-G, Cr=R-G — exact integers, inverse in decode), then
      // per-component DWT
      val shifted: IndexedSeq[Array[Int]] = planes.indices.map { ci =>
        if (lossyOfE(ci)) null
        else {
          val p = planes(ci)
          val (cw, ch) = tdims(ci)
          val a = new Array[Int](cw * ch)
          val shift = if (p.signed) 0 else 1 << (p.depth - 1)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              a(y * cw + x) = p.samples((ty0 + y) * p.w + (tx0 + x)) - shift
              x += 1
            }
            y += 1
          }
          a
        }
      }
      if (!lossy && mct) {
        val r = shifted(0); val g = shifted(1); val b = shifted(2)
        var i = 0
        while (i < tcw * tch) {
          val y = (r(i) + 2 * g(i) + b(i)) >> 2
          val cb2 = b(i) - g(i)
          val cr = r(i) - g(i)
          r(i) = y; g(i) = cb2; b(i) = cr
          i += 1
        }
      }
      // lossy: DC shift to doubles, irreversible ICT, 9/7 pyramid
      val shiftedD: IndexedSeq[Array[Double]] = planes.indices.map { ci =>
        if (!lossyOfE(ci)) null
        else {
          val p = planes(ci)
          val (cw, ch) = tdims(ci)
          val a = new Array[Double](cw * ch)
          val shift = if (p.signed) 0 else 1 << (p.depth - 1)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              a(y * cw + x) =
                (p.samples((ty0 + y) * p.w + (tx0 + x)) - shift).toDouble
              x += 1
            }
            y += 1
          }
          a
        }
      }
      if (lossy && mct) {
        val r = shiftedD(0); val g = shiftedD(1); val b = shiftedD(2)
        var i = 0
        while (i < tcw * tch) {
          val y = 0.299 * r(i) + 0.587 * g(i) + 0.114 * b(i)
          val cb2 = -0.168736 * r(i) - 0.331264 * g(i) + 0.5 * b(i)
          val cr = 0.5 * r(i) - 0.418688 * g(i) - 0.081312 * b(i)
          r(i) = y; g(i) = cb2; b(i) = cr
          i += 1
        }
      }
      // per-component pyramids at the component's OWN level count (and
      // transform): lossy components get the 9/7 double pyramid, the
      // reversible ones the 5/3 integer pyramid
      val transformedD: IndexedSeq[Array[(Array[Double], Int, Int)]] =
        planes.indices.map { ci =>
          if (!lossyOfE(ci)) null
          else {
            val nlc = nlOfE(ci)
            var (cw, ch) = tdims(ci)
            var buf = shiftedD(ci)
            val quads = new Array[(Array[Double], Int, Int)](nlc + 1)
            var l = 0
            while (l < nlc) {
              val (t, lw2, lh2) = fwd2d97(buf, cw, ch)
              quads(l) = (t, cw, ch)
              val nxt = new Array[Double](lw2 * lh2)
              var yy = 0
              while (yy < lh2) {
                System.arraycopy(t, yy * cw, nxt, yy * lw2, lw2)
                yy += 1
              }
              buf = nxt
              cw = lw2
              ch = lh2
              l += 1
            }
            quads(nlc) = (buf, cw, ch)
            quads
          }
        }
      val transformed: IndexedSeq[Array[(Array[Int], Int, Int)]] =
        planes.indices.map { ci =>
          if (lossyOfE(ci)) null
          else {
            val nlc = nlOfE(ci)
            var (cw, ch) = tdims(ci)
            var buf = shifted(ci)
            // quads(l) = the level-(l+1) split of the level-l LL region,
            // stride lowLen(tcw, l); quads(nlc) = the final LL itself
            val quads = new Array[(Array[Int], Int, Int)](nlc + 1)
            var l = 0
            while (l < nlc) {
              val (t, lw2, lh2) = fwd2d(buf, cw, ch)
              quads(l) = (t, cw, ch)
              val nxt = new Array[Int](lw2 * lh2)
              var yy = 0
              while (yy < lh2) {
                System.arraycopy(t, yy * cw, nxt, yy * lw2, lw2)
                yy += 1
              }
              buf = nxt
              cw = lw2
              ch = lh2
              l += 1
            }
            quads(nlc) = (buf, cw, ch) // final LL
            quads
          }
        }

      // band sample extractor: band coords -> SIGNED coefficient array.
      // Lossless: raw 5/3 integers; lossy: 9/7 doubles quantized with
      // the SIGNALLED step (sign * floor(|v| / Δ̂_b)).
      def bandCoeffs(comp: Int, r: Int, band: Int, bw: Int, bh: Int,
          xOff: Int, yOff: Int): Array[Int] = {
        val outA = new Array[Int](bw * bh)
        val nlc = nlOfE(comp)
        if (!lossyOfE(comp)) {
          val quads = transformed(comp)
          if (r == 0) {
            val (ll, lw2, _) = quads(nlc)
            var y = 0
            while (y < bh) {
              System.arraycopy(ll, y * lw2, outA, y * bw, bw)
              y += 1
            }
          } else {
            val l = nlc - r + 1
            val (t, qw, _) = quads(l - 1)
            var y = 0
            while (y < bh) {
              var x = 0
              while (x < bw) {
                outA(y * bw + x) = t((yOff + y) * qw + (xOff + x))
                x += 1
              }
              y += 1
            }
          }
        } else {
          val quads = transformedD(comp)
          val delta = stepHatEnc(r, band)
          @inline def q(v: Double): Int = {
            val m = math.floor(math.abs(v) / delta).toInt
            if (v < 0) -m else m
          }
          if (r == 0) {
            val (ll, lw2, _) = quads(nlc)
            var y = 0
            while (y < bh) {
              var x = 0
              while (x < bw) {
                outA(y * bw + x) = q(ll(y * lw2 + x))
                x += 1
              }
              y += 1
            }
          } else {
            val l = nlc - r + 1
            val (t, qw, _) = quads(l - 1)
            var y = 0
            while (y < bh) {
              var x = 0
              while (x < bw) {
                outA(y * bw + x) = q(t((yOff + y) * qw + (xOff + x)))
                x += 1
              }
              y += 1
            }
          }
        }
        outA
      }

      // ---- EBCOT every code-block first (packet emission below may
      // interleave bands/resolutions in any progression order) ----
      final class CbE(val bytes: Array[Byte], val np: Int, val zbp: Int) {
        val split: Array[(Int, Int)] = layerSplit(np, bytes.length, layers)
        val firstL: Int = split.indexWhere(_._1 > 0) // -1 when np == 0
        var lblock = 3
        var included = false
        var byteOff = 0
      }
      // geometry + encoded blocks per (component, resolution, band);
      // resolutions above a component's OWN level count carry no bands
      val geoms = Array.tabulate(planes.length, nl + 1) { (comp, r) =>
        val (px, py) = ppOfE(comp)
        val (tcwC, tchC) = tdims(comp)
        if (r > nlOfE(comp)) Seq.empty[(BandGeom, Array[CbE])]
        else bandGeoms(tcwC, tchC, nlOfE(comp), r, cbExpOfE(comp), px, py).map { g =>
          val mb = mbOf(comp, r, g.band)
          // one band extraction, shared by every code-block (extracting
          // per block is O(band x blocks) — quadratic on big images)
          val bs = bandCoeffs(comp, r, g.band, g.bw, g.bh, g.xOff, g.yOff)
          // RGN maxshift: scale the ROI's band-coordinate support rect
          // UP by the component's SPrgn (mb above already carries +s).
          // The rect is a conservative SUPERSET of the coefficients
          // influencing the ROI pixels — legal: extra background just
          // joins the ROI set, and the decoder's magnitude test is
          // position-free so both sets roundtrip exactly.
          val sroi = roiS.getOrElse(comp, 0)
          if (sroi > 0) {
            val nlc = nlOfE(comp)
            val lvl = if (r == 0) nlc else nlc - r + 1
            val (a, b2, c2, d2) = roiRects(comp)(lvl)
            val xr0 = math.max(0, a); val yr0 = math.max(0, b2)
            val xr1 = math.min(g.bw, c2); val yr1 = math.min(g.bh, d2)
            var yy = yr0
            while (yy < yr1) {
              var xx = xr0
              while (xx < xr1) {
                bs(yy * g.bw + xx) = bs(yy * g.bw + xx) << sroi
                xx += 1
              }
              yy += 1
            }
          }
          val grid = new Array[CbE](g.gw * g.gh)
          for (gy <- 0 until g.gh; gx <- 0 until g.gw) {
            val x0 = gx * g.cbw; val y0 = gy * g.cbh
            val cw2 = math.min(g.cbw, g.bw - x0)
            val ch2 = math.min(g.cbh, g.bh - y0)
            val magA = new Array[Int](cw2 * ch2)
            val negA = new Array[Boolean](cw2 * ch2)
            var y = 0
            while (y < ch2) {
              var x = 0
              while (x < cw2) {
                val v = bs((y0 + y) * g.bw + (x0 + x))
                magA(y * cw2 + x) = math.abs(v)
                negA(y * cw2 + x) = v < 0
                x += 1
              }
              y += 1
            }
            val (bytes, np, zbp) = encodeCb(g.band, cw2, ch2, magA, negA, mb)
            grid(gy * g.gw + gx) = new CbE(bytes, np, zbp)
          }
          (g, grid)
        }
      }
      // per-(resolution, component, precinct, band) tag trees, created
      // once and PERSISTENT across layers (B.10.4: inclusion thresholds
      // rise with the layer; zbp is coded at first inclusion only)
      val trees = scala.collection.mutable.HashMap
        .empty[(Int, Int, Int, Int), (TagTree, TagTree)]
      def treesOf(r: Int, c: Int, p: Int, bi: Int, g: BandGeom,
          grid: Array[CbE], gx0: Int, gy0: Int, gx1: Int, gy1: Int)
          : (TagTree, TagTree) =
        trees.getOrElseUpdate((r, c, p, bi), {
          val incl = new TagTree(gx1 - gx0, gy1 - gy0)
          val zbpT = new TagTree(gx1 - gx0, gy1 - gy0)
          for (gy <- gy0 until gy1; gx <- gx0 until gx1) {
            val cbRec = grid(gy * g.gw + gx)
            incl.set(gx - gx0, gy - gy0,
              if (cbRec.firstL >= 0) cbRec.firstL else layers)
            zbpT.set(gx - gx0, gy - gy0, cbRec.zbp)
          }
          incl.reset(); zbpT.reset()
          (incl, zbpT)
        })

      // ---- packets in progression order; per-packet byte lengths
      // (SOP + header + EPH + bodies) emitted as a PLT marker segment so
      // a reader can fetch ONLY the leading packets for a reduced-
      // resolution decode (A.7.1 — informational otherwise) ----
      val packetLens = new ArrayBuffer[Int]()
      var nsop = 0
      packetSeqOf(order, poc, layers, planes.length, nlOfE, tdims,
          (_, c) => ppOfE(c), ssOf).foreach { pk =>
        val bandsHere = geoms(pk.c)(pk.r)
        val any = bandsHere.exists { case (g, grid) =>
          val (gx0, gy0, gx1, gy1) = g.cbRect(pk.pix, pk.piy)
          (gy0 until gy1).exists(gy => (gx0 until gx1).exists(gx =>
            grid(gy * g.gw + gx).split(pk.l)._1 > 0))
        }
        var pktBytes = 0
        if (sopEph) { // SOP marker segment (D.2) before the header
          body.write(0xFF); body.write(0x91); body.write(0); body.write(4)
          body.write((nsop >> 8) & 0xFF); body.write(nsop & 0xFF)
          pktBytes += 6
        }
        nsop = (nsop + 1) & 0xFFFF
        val bwr = new BitWriter
        val bodies = new ArrayBuffer[(Array[Byte], Int, Int)]() // (buf, off, len)
        if (!any) bwr.bit(0) // empty packet: no contributions this layer
        else {
          bwr.bit(1)
          bandsHere.zipWithIndex.foreach { case ((g, grid), bi) =>
            val (gx0, gy0, gx1, gy1) = g.cbRect(pk.pix, pk.piy)
            if (gx0 < gx1 && gy0 < gy1) {
              val (incl, zbpT) =
                treesOf(pk.r, pk.c, pk.p, bi, g, grid, gx0, gy0, gx1, gy1)
              for (gy <- gy0 until gy1; gx <- gx0 until gx1) {
                val cbRec = grid(gy * g.gw + gx)
                val (npL, lenL) = cbRec.split(pk.l)
                val first = !cbRec.included && npL > 0
                if (!cbRec.included) {
                  incl.encode(bwr, gx - gx0, gy - gy0, pk.l + 1)
                  if (first) cbRec.included = true
                } else bwr.bit(if (npL > 0) 1 else 0)
                if (npL > 0) {
                  if (first) {
                    // zero-bitplane tag tree: encoding at threshold zbp+1
                    // emits exactly the bits the decoder's rising-
                    // threshold loop reads
                    zbpT.encode(bwr, gx - gx0, gy - gy0, cbRec.zbp + 1)
                  }
                  writePassCount(bwr, npL)
                  // length: one codeword segment per contribution; Lblock
                  // is PER CODE-BLOCK and persists across layers
                  val needed = math.max(0,
                    bitLen(lenL) - (cbRec.lblock + floorLog2(npL)))
                  var k = 0
                  while (k < needed) { bwr.bit(1); k += 1 }
                  bwr.bit(0)
                  cbRec.lblock += needed
                  bwr.bits(lenL, cbRec.lblock + floorLog2(npL))
                  bodies += ((cbRec.bytes, cbRec.byteOff, lenL))
                  cbRec.byteOff += lenL
                }
              }
            }
          }
        }
        val header = bwr.finish()
        val hsink = if (packedHeaders == 0) body else hdrOut
        hsink.write(header)
        if (packedHeaders == 0) pktBytes += header.length
        if (sopEph) { // EPH (D.3) terminates the header WHEREVER it lives
          hsink.write(0xFF); hsink.write(0x92)
          if (packedHeaders == 0) pktBytes += 2
        }
        bodies.foreach { case (buf, off, len) => body.write(buf, off, len) }
        // PLT length = the packet's IN-STREAM bytes (bodies + SOP only
        // when the header is relocated to PPM/PPT)
        packetLens += pktBytes + bodies.map(_._3).sum
      }
      (body.toByteArray, hdrOut.toByteArray, packetLens)
    }

    // PLT payload per tile: packet lengths as 7-bit big-endian varints
    // (continuation bit 0x80), split into <= 65535-byte segments AT
    // VARINT BOUNDARIES only — a varint cut across two PLT segments
    // would corrupt every later length for a parser that (legally)
    // resets per segment
    def pltSegsOf(packetLens: ArrayBuffer[Int]): Seq[Array[Byte]] = {
      val segs = new ArrayBuffer[Array[Byte]]()
      var cur = new java.io.ByteArrayOutputStream()
      packetLens.foreach { len =>
        val v = new java.io.ByteArrayOutputStream()
        var started = false
        var shift = 28
        while (shift > 0) {
          val part = (len >> shift) & 0x7F
          if (part != 0 || started) { v.write(part | 0x80); started = true }
          shift -= 7
        }
        v.write(len & 0x7F)
        if (cur.size() + v.size() > 65532) { segs += cur.toByteArray; cur = new java.io.ByteArrayOutputStream() }
        v.writeTo(cur)
      }
      if (cur.size() > 0) segs += cur.toByteArray
      require(segs.length <= 256, "jpeg2000: PLT exceeds 256 segments (Zplt is u8)")
      segs.toSeq
    }

    // every tile-part to emit, in stream order: (tile index, TPsot,
    // TNsot, PLT segments, body slice (buf, off, len), packed headers)
    val allParts: Seq[(Int, Int, Int, Seq[Array[Byte]],
        (Array[Byte], Int, Int), Array[Byte])] =
      (for (ty <- 0 until nty; tx <- 0 until ntx) yield {
        val ti = ty * ntx + tx
        val tx0 = tx * tw; val ty0 = ty * th
        val tcw = math.min(tw, w - tx0); val tch = math.min(th, h - ty0)
        val (bodyBytes, hdrBytes, lens) = encodeTile(tx0, ty0, tcw, tch)
        if (!partsPerResolution)
          Seq((ti, 0, 1, pltSegsOf(lens), (bodyBytes, 0, bodyBytes.length),
            hdrBytes))
        else {
          // one tile-part per RESOLUTION (the layout real encoders emit
          // for resolution-progressive streams): RLCP/RPCL sort packets
          // with r as the outer key, so resolution groups are contiguous
          // and their sizes follow from the precinct grids — the same
          // formula leadingPacketCount uses on the decode side
          var pktAt = 0
          var byteAt = 0
          (0 to nl).map { r =>
            val n = layers * planes.indices.map { c =>
              val (px, py) = ppOfE(c)
              val (npx, npy) = precGridOf(tcw, tch, nl, r, px, py)
              npx * npy
            }.sum
            val grp = lens.slice(pktAt, pktAt + n)
            val grpBytes = grp.sum
            val part = (ti, r, nl + 1, pltSegsOf(grp),
              (bodyBytes, byteAt, grpBytes), Array.empty[Byte])
            pktAt += n; byteAt += grpBytes
            part
          }
        }
      }).flatten

    // split a packed-header payload into <= 65532-byte PPT/PPM marker
    // chunks (records/headers may legally SPAN segments — A.7.4/A.7.5)
    def hdrChunks(data: Array[Byte]): Seq[Array[Byte]] =
      if (data.isEmpty) Seq.empty
      else data.grouped(65532).toSeq

    def psotOf(p: (Int, Int, Int, Seq[Array[Byte]],
        (Array[Byte], Int, Int), Array[Byte])): Int =
      12 + p._4.map(_.length + 5).sum +
        (if (packedHeaders == 2) hdrChunks(p._6).map(_.length + 5).sum else 0) +
        (if (pocInTilePart && p._2 == 0) 4 + 7 * poc.length else 0) +
        (if (rgnInTilePart && p._2 == 0) 7 * roiS.size else 0) +
        2 + p._5._3

    // PPM (A.7.4): one (Nppm u32, packed headers) record per tile-part
    // in codestream order, the record stream split across <= 65532-byte
    // Zppm-indexed marker segments (records may span segments)
    if (packedHeaders == 1) {
      val recs = new java.io.ByteArrayOutputStream()
      allParts.foreach { p =>
        val hdr = p._6
        recs.write((hdr.length >>> 24) & 0xFF); recs.write((hdr.length >>> 16) & 0xFF)
        recs.write((hdr.length >>> 8) & 0xFF); recs.write(hdr.length & 0xFF)
        recs.write(hdr)
      }
      val chunks = hdrChunks(recs.toByteArray)
      require(chunks.length <= 256, "jpeg2000: PPM exceeds 256 segments")
      chunks.zipWithIndex.foreach { case (chunk, zi) =>
        u16(0xFF60)
        u16(3 + chunk.length)
        u8(zi)
        out.write(chunk)
      }
    }

    // TLM (A.7.1): tile-part lengths in the MAIN header, so a ranged
    // reader can fetch exactly the tile-parts a spatial window (or a
    // resolution prefix) needs without scanning the codestream.
    // Single-part layout keeps Stlm = 0x40 (Ttlm omitted: tiles in index
    // order, one part each, Ptlm 4 bytes); per-resolution parts write
    // Stlm = 0x60 (Ttlm 16-bit tile index + 32-bit Ptlm per part).
    if (!partsPerResolution) {
      val tlmCapacity = (65535 - 4) / 4
      allParts.map(psotOf).grouped(tlmCapacity).zipWithIndex.foreach {
        case (grp, zi) =>
          require(zi <= 255, "jpeg2000: TLM exceeds 256 segments (Ztlm is u8)")
          u16(0xFF55)
          u16(4 + 4 * grp.length)
          u8(zi)
          u8(0x40)
          grp.foreach(u32)
      }
    } else {
      val tlmCapacity = (65535 - 4) / 6
      allParts.map(p => (p._1, psotOf(p))).grouped(tlmCapacity).zipWithIndex
        .foreach { case (grp, zi) =>
          require(zi <= 255, "jpeg2000: TLM exceeds 256 segments (Ztlm is u8)")
          u16(0xFF55)
          u16(4 + 6 * grp.length)
          u8(zi)
          u8(0x60)
          grp.foreach { case (ti, psot) => u16(ti); u32(psot) }
        }
    }

    allParts.foreach { case p @ (ti, tpsot, tnsot, segs, (body, off, len), hdr) =>
      u16(0xFF90) // SOT
      u16(10)
      u16(ti)     // Isot
      u32(psotOf(p))
      u8(tpsot); u8(tnsot)
      if (rgnInTilePart && tpsot == 0) { // per-tile RGN (A.6.3/E.1)
        roiS.toSeq.sortBy(_._1).foreach { case (c, sh) =>
          u16(0xFF5E)
          u16(5)
          u8(c); u8(0); u8(sh)
        }
      }
      if (pocInTilePart && tpsot == 0) { // per-tile POC (A.6.6)
        u16(0xFF5F)
        u16(2 + 7 * poc.length)
        poc.foreach { case (rs, cs, lye, re, ce, pp) =>
          u8(rs); u8(cs); u16(lye); u8(re); u8(math.min(ce, 255)); u8(pp)
        }
      }
      if (packedHeaders == 2) { // PPT (A.7.5): Zppt-indexed header chunks
        val chunks = hdrChunks(hdr)
        require(chunks.length <= 256, "jpeg2000: PPT exceeds 256 segments")
        chunks.zipWithIndex.foreach { case (chunk, zi) =>
          u16(0xFF61)
          u16(3 + chunk.length)
          u8(zi)
          out.write(chunk)
        }
      }
      segs.zipWithIndex.foreach { case (seg, zi) =>
        u16(0xFF58) // PLT
        u16(3 + seg.length)
        u8(zi)
        out.write(seg)
      }
      u16(0xFF93) // SOD
      out.write(body, off, len)
    }
    u16(0xFFD9) // EOC
    out.toByteArray
  }

  private def bitLen(v: Int): Int = if (v == 0) 1 else 32 - Integer.numberOfLeadingZeros(v)
  private def floorLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Decode a raw codestream or a JP2 container. */
  def decode(bytes: Array[Byte]): Seq[Plane] = decode(bytes, 0, None)

  def decode(bytes: Array[Byte], discardLevels: Int): Seq[Plane] =
    decode(bytes, discardLevels, None)

  /** Decode EXACTLY the pixels of a window: packet headers are all
    * parsed (cheap), but only the code-blocks whose coefficients
    * influence the window — the window's per-level wavelet pyramid plus
    * a 4-sample lifting margin — are entropy-decoded. EBCOT is the
    * dominant decode cost, so a small window over a big scene skips
    * almost all of it (the full-plane inverse DWT that remains is
    * linear and cheap). Exactness is differential-tested against
    * full-decode-then-crop. */
  def decodeWindow(bytes: Array[Byte], x0: Int, y0: Int,
      ww: Int, wh: Int): Seq[Plane] = {
    require(ww > 0 && wh > 0 && x0 >= 0 && y0 >= 0,
      s"jpeg2000: bad window ($x0,$y0,$ww,$wh)")
    decode(bytes, 0, Some((x0, y0, ww, wh)))
  }

  /** Windowed REDUCED-resolution decode: the window is in level-`d`
    * (reduced) coordinates. Only the tiles the window intersects are
    * touched, so a ranged reader may hand a stitched stream holding just
    * those tile-parts (missing non-intersecting tiles are fine). */
  def decodeWindowAt(bytes: Array[Byte], d: Int, x0: Int, y0: Int,
      ww: Int, wh: Int): Seq[Plane] = {
    require(ww > 0 && wh > 0 && x0 >= 0 && y0 >= 0,
      s"jpeg2000: bad window ($x0,$y0,$ww,$wh)")
    decode(bytes, d, Some((x0, y0, ww, wh)))
  }

  /** Decode at a REDUCED resolution: `discardLevels` highest-frequency
    * decomposition levels are skipped — only the packets of resolutions
    * 0..NL-discard are entropy-decoded (they come first in LRCP order,
    * so later packet bytes are never touched), and the inverse DWT stops
    * at the requested level. The result is the 5/3 LL approximation at
    * 1/2^discard scale per axis — JPEG 2000's native resolution
    * scalability, the overview mechanism GDAL exposes for JP2 (and the
    * reason a 100 TB Sentinel-2 archive can be thumbnailed without
    * decoding full scenes). */
  /** Parsed main-header state (everything before the first SOT). All
    * positions are ABSOLUTE offsets into the original byte array — JP2
    * containers are parsed IN PLACE from the jp2c payload offset, never
    * copied out (a 256KB header probe of a multi-GB scene must stay
    * header-bounded, and a declared box length near 2^31 must not drive
    * an allocation). */
  private[sources] final case class MainHeader(
      csOff: Int, w: Int, h: Int, tw: Int, th: Int, nc: Int,
      depths: Array[Int], signed: Array[Boolean], nl: Int, cbExp: Int,
      mct: Int, transform: Int, qStyle: Int,
      qcdGuard: Int, qcdExps: Array[Int], qcdMus: Array[Int],
      qccGuard: Map[Int, Int], qccExps: Map[Int, Array[Int]],
      qccMus: Map[Int, Array[Int]],
      firstSot: Int,
      order: Int = 0, layers: Int = 1,
      sop: Boolean = false, eph: Boolean = false,
      ppx: Array[Int] = null, ppy: Array[Int] = null,
      cocCbExp: Map[Int, Int] = Map.empty,
      cocPpx: Map[Int, Array[Int]] = Map.empty,
      cocPpy: Map[Int, Array[Int]] = Map.empty,
      cocNl: Map[Int, Int] = Map.empty,
      cocTr: Map[Int, Int] = Map.empty,
      qccStyle: Map[Int, Int] = Map.empty,
      ssx: Array[Int] = null,
      ssy: Array[Int] = null,
      // POC progression-order changes (main header): ordered segments of
      // (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) replacing the COD order
      poc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
      // PPM: the Zppm-ordered concatenation of all PPM marker payloads —
      // a stream of (Nppm u32, packed packet headers) records, one record
      // per tile-part in codestream order (A.7.4)
      ppm: Option[Array[Byte]] = None,
      // RGN maxshift (Srgn = 0): component -> SPrgn ROI upshift (E.1)
      roiShift: Map[Int, Int] = Map.empty) {
    /** SIZ per-component subsampling (XRsiz, YRsiz); (1,1) when absent. */
    def ssOf(comp: Int): (Int, Int) =
      if (ssx == null) (1, 1) else (ssx(comp), ssy(comp))
    def subsampled: Boolean =
      ssx != null && (0 until nc).exists(c => ssx(c) != 1 || ssy(c) != 1)
    /** Decomposition levels for a component (COC override or COD). */
    def nlOf(comp: Int): Int = cocNl.getOrElse(comp, nl)
    /** Wavelet transform for a component (0 = 9/7, 1 = 5/3). */
    def trOf(comp: Int): Int = cocTr.getOrElse(comp, transform)
    /** Quantization style for a component (QCC override or QCD). */
    def qStyleOf(comp: Int): Int = qccStyle.getOrElse(comp, qStyle)
    /** Precinct exponents for (resolution, component): the component's
      * COC override when present, else the COD's (maximal when none
      * signalled). */
    def ppOf(r: Int, comp: Int): (Int, Int) = cocPpx.get(comp) match {
      case Some(px) => (px(r), cocPpy(comp)(r))
      case None => if (ppx == null) (15, 15) else (ppx(r), ppy(r))
    }
    /** Code-block size exponent for a component (COC override or COD). */
    def cbExpOf(comp: Int): Int = cocCbExp.getOrElse(comp, cbExp)
    def epsTable(comp: Int): Array[Int] = qccExps.getOrElse(comp, qcdExps)
    def muTable(comp: Int): Array[Int] = qccMus.getOrElse(comp, qcdMus)
    def guardOf(comp: Int): Int = qccGuard.getOrElse(comp, qcdGuard)
    private def bandIdx(r: Int, band: Int): Int =
      if (r == 0) 0 else 1 + (r - 1) * 3 + (band - 1)
    /** Signalled (ε, μ) for (component, resolution, band). Style 2
      * (scalar expounded) indexes the per-subband table; style 1
      * (scalar DERIVED, E.1.1) carries one (ε0, μ0) and derives
      * ε_b = ε0 − N_L + n_b with n_b the band's decomposition depth
      * (N_L for the LL, N_L − r + 1 at resolution r ≥ 1), μ_b = μ0. */
    private def epsMuOf(comp: Int, r: Int, band: Int): (Int, Int) = {
      val exps = epsTable(comp)
      val mus = muTable(comp)
      if (qStyleOf(comp) == 1) {
        require(exps.length >= 1 && mus.length >= 1,
          "jpeg2000: derived quantization signalled without its (ε0, μ0)")
        (exps(0) + (if (r == 0) 0 else 1 - r), mus(0))
      } else {
        val idx = bandIdx(r, band)
        require(idx < exps.length && idx < mus.length,
          s"jpeg2000: QCD/QCC carries ${exps.length} exponents but " +
            s"resolution $r band $band needs index $idx")
        (exps(idx), mus(idx))
      }
    }
    /** Mb for (component, resolution r, band) from the SIGNALLED
      * exponents — never recomputed from bit depths, so a legal foreign
      * stream with different per-subband exponents decodes by its own
      * declaration (and an exponent table shorter than the COD levels
      * fails loudly). */
    /** Mb under an explicit ROI-shift table (tile-part RGN entries
      * override the main header's per component). The 31-bit cap is a
      * hard decoder contract: EBCOT magnitudes live in Ints, so a
      * hostile/foreign stream whose ε + guard + SPrgn would need more
      * bits must refuse loudly here instead of wrapping shifts into
      * silent garbage pixels. */
    def mbOf(comp: Int, r: Int, band: Int, roi: Map[Int, Int]): Int = {
      val mb = epsMuOf(comp, r, band)._1 + guardOf(comp) - 1 +
        roi.getOrElse(comp, 0)
      require(mb <= 31,
        s"jpeg2000: Mb $mb exceeds 31-bit EBCOT magnitudes (quantization " +
          "exponent / guard bits / ROI shift too large)")
      mb
    }
    /** Lossy reconstruction step for (component, resolution, band) from
      * the signalled (ε, μ) at Rb = component depth + subband gain. */
    def stepHatOf(comp: Int, r: Int, band: Int): Double = {
      val (e, m) = epsMuOf(comp, r, band)
      val gain = band match { case 0 => 0; case 3 => 2; case _ => 1 }
      stepOf(e, m, depths(comp) + gain)
    }
    def ntx: Int = ceilDiv(w, tw)
    def nty: Int = ceilDiv(h, th)
    def multiTile: Boolean = ntx > 1 || nty > 1
  }

  private def codestreamOffsetOf(bytes: Array[Byte]): Int =
    if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0x4F) 0
    else jp2CodestreamOffset(bytes).getOrElse(throw new IllegalArgumentException(
      "jpeg2000: neither a codestream nor a JP2 file"))

  private def parseMainHeader(bytes: Array[Byte]): MainHeader = {
    val csOff = codestreamOffsetOf(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require((bb.getShort(csOff) & 0xFFFF) == 0xFF4F, "jpeg2000: missing SOC")
    var pos = csOff + 2
    var w = 0; var h = 0; var tw = 0; var th = 0; var nc = 0
    var depths: Array[Int] = null
    var signedA: Array[Boolean] = null
    var ssxA: Array[Int] = null
    var ssyA: Array[Int] = null
    var nl = -1; var cbExp = -1
    var order = 0; var layers = 1
    var sop = false; var eph = false
    var ppx: Array[Int] = null
    var ppy: Array[Int] = null
    var qcdGuard = -1
    var qcdExps: Array[Int] = null
    var qcdMus: Array[Int] = null
    var qccGuard = Map.empty[Int, Int]
    var qccExps = Map.empty[Int, Array[Int]]
    var qccMus = Map.empty[Int, Array[Int]]
    var cocCb = Map.empty[Int, Int]
    var cocPx = Map.empty[Int, Array[Int]]
    var cocPy = Map.empty[Int, Array[Int]]
    var cocNlM = Map.empty[Int, Int]
    var cocTrM = Map.empty[Int, Int]
    var qccStyleM = Map.empty[Int, Int]
    var mct = 0
    var transform = -1
    var qStyle = -1
    var firstSot = -1
    var pocSegs = Vector.empty[(Int, Int, Int, Int, Int, Int)]
    var ppmChunks = Vector.empty[(Int, Array[Byte])] // (Zppm, payload)
    var roiShiftM = Map.empty[Int, Int]
    // SPqcd/SPqcc payload -> (exponents, mantissas): style 0 (no
    // quantization) is one byte per subband (ε << 3, μ = 0); style 2
    // (scalar expounded) is a 16-bit (ε << 11 | μ) word per subband
    def parseSp(style: Int, start: Int, end: Int): (Array[Int], Array[Int]) =
      if (style == 0) {
        val es = (start until end).map(i => (bb.get(i) & 0xFF) >> 3).toArray
        (es, new Array[Int](es.length))
      } else {
        val n = (end - start) / 2
        val es = new Array[Int](n)
        val ms = new Array[Int](n)
        var i = 0
        while (i < n) {
          val word = bb.getShort(start + 2 * i) & 0xFFFF
          es(i) = word >> 11
          ms(i) = word & 0x7FF
          i += 1
        }
        (es, ms)
      }
    while (firstSot < 0) {
      require(pos + 4 <= bytes.length, "jpeg2000: truncated main header")
      val marker = bb.getShort(pos) & 0xFFFF
      require((marker >> 8) == 0xFF, f"jpeg2000: bad marker at $pos: $marker%04x")
      marker match {
        case 0xFF51 => // SIZ
          val base = pos + 4
          require((bb.getShort(base) & 0xFFFF) == 0, "jpeg2000: non-zero Rsiz")
          w = bb.getInt(base + 2)
          h = bb.getInt(base + 6)
          require(bb.getInt(base + 10) == 0 && bb.getInt(base + 14) == 0,
            "jpeg2000: image offset unsupported")
          tw = bb.getInt(base + 18)
          th = bb.getInt(base + 22)
          require(bb.getInt(base + 26) == 0 && bb.getInt(base + 30) == 0,
            "jpeg2000: tile grid offset unsupported")
          require(tw > 0 && th > 0, "jpeg2000: zero tile size")
          nc = bb.getShort(base + 34) & 0xFFFF
          depths = new Array[Int](nc)
          signedA = new Array[Boolean](nc)
          ssxA = new Array[Int](nc)
          ssyA = new Array[Int](nc)
          for (i <- 0 until nc) {
            val ssiz = bb.get(base + 36 + 3 * i) & 0xFF
            depths(i) = (ssiz & 0x7F) + 1
            signedA(i) = (ssiz & 0x80) != 0
            ssxA(i) = bb.get(base + 37 + 3 * i) & 0xFF
            ssyA(i) = bb.get(base + 38 + 3 * i) & 0xFF
            require(ssxA(i) >= 1 && ssyA(i) >= 1,
              s"jpeg2000: component $i subsampling 0")
          }
        case 0xFF52 => // COD
          val base = pos + 4
          val scod = bb.get(base) & 0xFF
          require((scod & ~7) == 0, f"jpeg2000: unknown Scod bits $scod%02x")
          val usePrec = (scod & 1) != 0
          sop = (scod & 2) != 0
          eph = (scod & 4) != 0
          order = bb.get(base + 1) & 0xFF
          require(order <= 4,
            s"jpeg2000: unknown progression order $order")
          layers = bb.getShort(base + 2) & 0xFFFF
          require(layers >= 1, "jpeg2000: zero quality layers")
          mct = bb.get(base + 4) & 0xFF
          require(mct == 0 || mct == 1,
            s"jpeg2000: unknown MCT mode $mct (0 = none, 1 = reversible RCT)")
          nl = bb.get(base + 5) & 0xFF
          cbExp = (bb.get(base + 6) & 0xFF) + 2
          require((bb.get(base + 7) & 0xFF) == cbExp - 2,
            "jpeg2000: non-square code-blocks unsupported")
          require((bb.get(base + 8) & 0xFF) == 0,
            "jpeg2000: code-block style options unsupported")
          transform = bb.get(base + 9) & 0xFF
          require(transform == 0 || transform == 1,
            s"jpeg2000: unknown wavelet transform $transform")
          ppx = Array.fill(nl + 1)(15)
          ppy = Array.fill(nl + 1)(15)
          if (usePrec) {
            val lcod = bb.getShort(pos + 2) & 0xFFFF
            require(lcod >= 12 + nl + 1,
              "jpeg2000: COD too short for the precinct table")
            for (r <- 0 to nl) {
              val b2 = bb.get(base + 10 + r) & 0xFF
              ppx(r) = b2 & 0xF
              ppy(r) = b2 >> 4
              require(r == 0 || (ppx(r) >= 1 && ppy(r) >= 1),
                s"jpeg2000: precinct exponent 0 at resolution $r > 0")
            }
          }
        case 0xFF5C => // QCD
          val lqcd = bb.getShort(pos + 2) & 0xFFFF
          val sqcd = bb.get(pos + 4) & 0xFF
          qStyle = sqcd & 0x1F
          require(qStyle == 0 || qStyle == 1 || qStyle == 2,
            s"jpeg2000: quantization style $qStyle unsupported " +
              "(0 = none, 1 = scalar derived, 2 = scalar expounded)")
          qcdGuard = sqcd >> 5
          val (es, ms) = parseSp(qStyle, pos + 5, pos + 2 + lqcd)
          qcdExps = es
          qcdMus = ms
        case 0xFF5D => // QCC: per-component quantization override
          require(nc > 0, "jpeg2000: QCC before SIZ")
          require(qStyle >= 0, "jpeg2000: QCC before QCD")
          val lqcc = bb.getShort(pos + 2) & 0xFFFF
          val cLen = if (nc < 257) 1 else 2
          val cqcc = if (nc < 257) bb.get(pos + 4) & 0xFF
            else bb.getShort(pos + 4) & 0xFFFF
          val sqcc = bb.get(pos + 4 + cLen) & 0xFF
          // a QCC may flip the style per component (a mixed-transform
          // stream signals its 5/3 components with style-0 QCCs under a
          // lossy QCD); consistency with the component's transform is
          // checked once all headers are parsed
          val qs = sqcc & 0x1F
          require(qs == 0 || qs == 1 || qs == 2,
            s"jpeg2000: quantization style $qs unsupported " +
              "(0 = none, 1 = scalar derived, 2 = scalar expounded)")
          if (qs != qStyle) qccStyleM += cqcc -> qs
          qccGuard += cqcc -> (sqcc >> 5)
          val (es, ms) = parseSp(qs, pos + 5 + cLen, pos + 2 + lqcc)
          qccExps += cqcc -> es
          qccMus += cqcc -> ms
        case 0xFF90 =>
          firstSot = pos
        case 0xFF53 => // COC: per-component coding-style override
          // Supported override surface: code-block size, precinct
          // partitions, decomposition levels, and the wavelet transform
          // (the packet walk, band grids, DWT pyramid, and quantization
          // all honour them per component). Still required: COC levels
          // <= COD levels (the COD carries the pyramid maximum this
          // codec sizes its walks by); more levels than COD refuses
          // loudly rather than decode wrong.
          require(nc > 0, "jpeg2000: COC before SIZ")
          require(nl >= 0 && transform >= 0, "jpeg2000: COC before COD")
          val cLen = if (nc < 257) 1 else 2
          val ccoc = if (nc < 257) bb.get(pos + 4) & 0xFF
            else bb.getShort(pos + 4) & 0xFFFF
          val scoc = bb.get(pos + 4 + cLen) & 0xFF
          require(scoc == 0 || scoc == 1,
            s"jpeg2000: unknown COC coding style $scoc")
          val b2 = pos + 5 + cLen
          val cnl = bb.get(b2) & 0xFF
          require(cnl <= nl,
            s"jpeg2000: COC declares $cnl decomposition levels above " +
              s"the COD's $nl — unsupported")
          val ce = (bb.get(b2 + 1) & 0xFF) + 2
          require((bb.get(b2 + 2) & 0xFF) == ce - 2,
            "jpeg2000: non-square code-blocks unsupported")
          require((bb.get(b2 + 3) & 0xFF) == 0,
            "jpeg2000: code-block style options unsupported")
          val ctr = bb.get(b2 + 4) & 0xFF
          require(ctr == 0 || ctr == 1,
            s"jpeg2000: unknown COC wavelet transform $ctr")
          cocCb += ccoc -> ce
          if (cnl != nl) cocNlM += ccoc -> cnl
          if (ctr != transform) cocTrM += ccoc -> ctr
          if (scoc == 0) {
            // A COC with Scoc=0 resets the component to MAXIMAL
            // precincts (A.6.2) — it does NOT inherit the COD's custom
            // grid. Record an explicit (15,15) table so ppOf never
            // falls back to the COD exponents for this component.
            cocPx += ccoc -> Array.fill(cnl + 1)(15)
            cocPy += ccoc -> Array.fill(cnl + 1)(15)
          }
          if (scoc == 1) {
            val lcoc = bb.getShort(pos + 2) & 0xFFFF
            require(lcoc >= 3 + cLen + 5 + cnl + 1,
              "jpeg2000: COC too short for the precinct table")
            val px = new Array[Int](cnl + 1)
            val py = new Array[Int](cnl + 1)
            for (r <- 0 to cnl) {
              val v = bb.get(b2 + 5 + r) & 0xFF
              px(r) = v & 0xF
              py(r) = v >> 4
              require(r == 0 || (px(r) >= 1 && py(r) >= 1),
                s"jpeg2000: COC precinct exponent 0 at resolution $r > 0")
            }
            cocPx += ccoc -> px
            cocPy += ccoc -> py
          }
        case 0xFF5E => // RGN (E.1): maxshift ROI scaling only
          val (crgn, sprgn) = parseRgn(bytes, bb, pos, nc)
          roiShiftM += crgn -> sprgn
        case 0xFF5F => // POC (A.6.6): ordered progression segments
          pocSegs ++= parsePocEntries(bytes, bb, pos, nc)
        case 0xFF60 => // PPM (A.7.4): packed packet headers, main header
          val len = bb.getShort(pos + 2) & 0xFFFF
          val z = bb.get(pos + 4) & 0xFF
          val payload = new Array[Byte](len - 3)
          System.arraycopy(bytes, pos + 5, payload, 0, len - 3)
          ppmChunks :+= ((z, payload))
        case _ => // skip informational marker segments (COM, CRG, TLM, PLM...)
      }
      if (firstSot < 0) pos += 2 + (bb.getShort(pos + 2) & 0xFFFF)
    }
    require(w > 0 && nl >= 0 && qcdGuard >= 0, "jpeg2000: incomplete headers")
    // transform/quantization consistency is PER COMPONENT: COC may flip
    // a component's transform and its QCC then flips the style with it
    for (c <- 0 until nc) {
      val t = cocTrM.getOrElse(c, transform)
      val qs = qccStyleM.getOrElse(c, qStyle)
      require((t == 1 && qs == 0) || (t == 0 && (qs == 1 || qs == 2)),
        s"jpeg2000: component $c transform $t with quantization style " +
          s"$qs unsupported (5/3 + none, or 9/7 + scalar derived/expounded)")
      // a component whose style differs from the QCD's MUST carry its
      // own table (the QCD one is the wrong shape for it)
      require(qs == qStyle || qccExps.contains(c),
        s"jpeg2000: component $c style $qs differs from the QCD's " +
          s"$qStyle but no QCC table was signalled")
    }
    require(mct == 0 || (0 until math.min(3, nc)).forall(c =>
        cocTrM.getOrElse(c, transform) == transform),
      "jpeg2000: MCT with mixed per-component transforms unsupported")
    if (ssxA != null && (0 until nc).exists(c => ssxA(c) != 1 || ssyA(c) != 1)) {
      require(mct == 0,
        "jpeg2000: MCT with component subsampling unsupported " +
          "(the RCT/ICT couples equal-size planes)")
      require(tw >= w && th >= h,
        "jpeg2000: component subsampling with tiling unsupported")
    }
    // RGN scope: decode applies the maxshift downshift on the reversible
    // integer path only — a quantized (9/7) ROI cannot be certified
    // bit-exactly without a foreign fixture, so it refuses loudly
    roiShiftM.keys.foreach { c =>
      require(c < nc, s"jpeg2000: RGN component $c out of range")
      require(cocTrM.getOrElse(c, transform) == 1,
        s"jpeg2000: RGN on a 9/7 (lossy) component $c unsupported")
    }
    // PPM payloads concatenate in Zppm order; duplicate indices refuse
    val ppmStream =
      if (ppmChunks.isEmpty) None
      else {
        require(ppmChunks.map(_._1).distinct.length == ppmChunks.length,
          "jpeg2000: duplicate Zppm index")
        val sorted = ppmChunks.sortBy(_._1)
        val total = sorted.map(_._2.length).sum
        val arr = new Array[Byte](total)
        var off = 0
        sorted.foreach { case (_, p) =>
          System.arraycopy(p, 0, arr, off, p.length); off += p.length }
        Some(arr)
      }
    MainHeader(csOff, w, h, math.min(tw, w), math.min(th, h), nc,
      depths, signedA, nl, cbExp, mct, transform, qStyle,
      qcdGuard, qcdExps, qcdMus, qccGuard, qccExps, qccMus, firstSot,
      order, layers, sop, eph, ppx, ppy, cocCb, cocPx, cocPy,
      cocNlM, cocTrM, qccStyleM, ssxA, ssyA, pocSegs, ppmStream, roiShiftM)
  }

  /** Tile-part directory: tile index -> ordered (sod position, part end)
    * segments, both absolute. A tile's coded data is the CONCATENATION of
    * its tile-part payloads in TPsot order (A.4.2 — tile-parts of
    * different tiles may interleave, but each tile's own parts arrive in
    * TPsot order, validated here). Tolerates ABSENT tiles and a TRUNCATED
    * final part (a ranged reader stitches only the tile-parts a window
    * or resolution prefix needs); the caller checks presence of the
    * tiles it requires. */
  /** One discovered tile-part: SOD payload bounds, the part's GLOBAL
    * ordinal in codestream order (what PPM records key on), its
    * PPT packed-header payloads (Zppt-ordered, empty when none), and
    * its POC segments (tile-part-header POC overrides the main header's
    * progression FOR THIS TILE — A.6.6; empty when none). */
  private final case class PartRec(sod: Int, end: Int, ordinal: Int,
      ppt: Vector[(Int, Array[Byte])],
      poc: Vector[(Int, Int, Int, Int, Int, Int)] = Vector.empty,
      roi: Map[Int, Int] = Map.empty)

  /** RGN (E.1) field extraction shared by the main-header and tile-part
    * parsers: (Crgn, SPrgn). Refuses non-maxshift styles and
    * out-of-range shifts here so the two call sites cannot drift. */
  private def parseRgn(bytes: Array[Byte], bb: ByteBuffer, pos: Int,
      nc: Int): (Int, Int) = {
    val base = pos + 4
    val big = nc >= 257
    val crgn = if (big) bb.getShort(base) & 0xFFFF else bytes(base) & 0xFF
    val srgn = bytes(base + (if (big) 2 else 1)) & 0xFF
    val sprgn = bytes(base + (if (big) 3 else 2)) & 0xFF
    require(srgn == 0,
      s"jpeg2000: RGN style $srgn unsupported (0 = implicit maxshift)")
    require(sprgn <= 37, s"jpeg2000: RGN SPrgn $sprgn out of range")
    (crgn, sprgn)
  }

  /** Parse one POC marker segment's entries at `pos` (marker offset). */
  private def parsePocEntries(bytes: Array[Byte], bb: ByteBuffer, pos: Int,
      nc: Int): Vector[(Int, Int, Int, Int, Int, Int)] = {
    val len = bb.getShort(pos + 2) & 0xFFFF
    val big = nc >= 257
    val entry = if (big) 9 else 7
    require((len - 2) % entry == 0 && len > 2,
      s"jpeg2000: POC length $len not a multiple of $entry entries")
    val n = (len - 2) / entry
    var out = Vector.empty[(Int, Int, Int, Int, Int, Int)]
    var q = pos + 4
    for (_ <- 0 until n) {
      val rs = bb.get(q) & 0xFF
      val cs = if (big) bb.getShort(q + 1) & 0xFFFF else bb.get(q + 1) & 0xFF
      val o = q + (if (big) 3 else 2)
      val lye = bb.getShort(o) & 0xFFFF
      val re = bb.get(o + 2) & 0xFF
      val ce0 = if (big) bb.getShort(o + 3) & 0xFFFF else bb.get(o + 3) & 0xFF
      val ce = if (ce0 == 0) 256 else ce0 // CEpoc 0 means "all" (Table A.32)
      val pp = bb.get(o + (if (big) 5 else 4)) & 0xFF
      require(pp <= 4, s"jpeg2000: POC progression $pp unknown")
      require(lye >= 1 && re > rs && ce > cs,
        s"jpeg2000: POC segment empty (rs=$rs re=$re cs=$cs ce=$ce lye=$lye)")
      out :+= ((rs, cs, lye, re, ce, pp))
      q += entry
    }
    out
  }

  private def scanTileParts(bytes: Array[Byte],
      hd: MainHeader): Map[Int, Vector[PartRec]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = hd.firstSot
    var parts = Map.empty[Int, Vector[PartRec]]
    var ordinal = 0
    var done = false
    while (!done && pos + 2 <= bytes.length) {
      val marker = bb.getShort(pos) & 0xFFFF
      if (marker == 0xFFD9) done = true
      else {
        require(marker == 0xFF90, f"jpeg2000: expected SOT at $pos, got $marker%04x")
        val isot = bb.getShort(pos + 4) & 0xFFFF
        val psot = bb.getInt(pos + 6)
        val tpsot = bb.get(pos + 10) & 0xFF
        // partEnd MAY exceed the buffer: a reduced-resolution reader
        // hands a PREFIX of the stream (only the leading packets were
        // fetched) — the packet loop's own truncation check guards every
        // byte actually read
        val partEnd = if (psot == 0) bytes.length - 2 else pos + psot
        // walk tile-part header markers to SOD; tile-specific COD/QCD/
        // QCC/COC/RGN overrides would change the decode of this tile
        // only — refuse loudly rather than decode wrong. PPT (A.7.5)
        // relocates this tile's packet headers into the tile-part
        // header, and a tile-part POC (A.6.6) replaces the progression
        // FOR THIS TILE: both collect.
        var q = pos + 12
        var sod = -1
        var ppt = Vector.empty[(Int, Array[Byte])]
        var pocT = Vector.empty[(Int, Int, Int, Int, Int, Int)]
        var roiT = Map.empty[Int, Int]
        while (sod < 0) {
          require(q + 4 <= bytes.length, "jpeg2000: truncated tile-part header")
          val m = bb.getShort(q) & 0xFFFF
          require((m >> 8) == 0xFF, f"jpeg2000: bad marker at $q: $m%04x")
          if (m == 0xFF93) sod = q + 2
          else {
            require(m != 0xFF52 && m != 0xFF53 && m != 0xFF5C && m != 0xFF5D,
              f"jpeg2000: tile-part coding override marker $m%04x unsupported")
            if (m == 0xFF61) {
              val len = bb.getShort(q + 2) & 0xFFFF
              val z = bytes(q + 4) & 0xFF
              val payload = new Array[Byte](len - 3)
              System.arraycopy(bytes, q + 5, payload, 0, len - 3)
              ppt :+= ((z, payload))
            }
            if (m == 0xFF5F) {
              // POC only in the FIRST tile-part of a tile: a mid-stream
              // progression change (TPsot > 0) would re-order packets
              // already consumed — refuse rather than decode wrong
              require(tpsot == 0,
                "jpeg2000: POC in a non-first tile-part unsupported")
              pocT ++= parsePocEntries(bytes, bb, q, hd.nc)
            }
            if (m == 0xFF5E) {
              // RGN (E.1) in the FIRST tile-part: a per-tile ROI shift —
              // mid-stream (TPsot > 0) would change Mb for code-blocks
              // already partially consumed
              require(tpsot == 0,
                "jpeg2000: RGN in a non-first tile-part unsupported")
              val (crgn, sprgn) = parseRgn(bytes, bb, q, hd.nc)
              require(crgn < hd.nc, s"jpeg2000: RGN component $crgn out of range")
              require(hd.trOf(crgn) == 1,
                s"jpeg2000: RGN on a 9/7 (lossy) component $crgn unsupported")
              roiT += crgn -> sprgn
            }
            q += 2 + (bb.getShort(q + 2) & 0xFFFF)
          }
        }
        val seen = parts.getOrElse(isot, Vector.empty)
        // TPsot must equal the count of this tile's parts already seen:
        // catches duplicates, gaps, and reordering in one check (a
        // stitched prefix legally DROPS trailing parts, never middle ones)
        require(tpsot == seen.length,
          s"jpeg2000: tile $isot tile-part out of order " +
            s"(TPsot $tpsot after ${seen.length} parts)")
        parts += isot -> (seen :+ PartRec(sod, partEnd, ordinal, ppt, pocT, roiT))
        ordinal += 1
        pos = partEnd
        if (psot == 0) done = true
      }
    }
    parts
  }

  /** The packed-header stream for ONE tile, or None when its headers are
    * in-stream. PPM: the Zppm-concatenated main-header stream is a
    * sequence of (Nppm u32, headers) records, record i belonging to the
    * i-th tile-part in CODESTREAM order — the tile's stream concatenates
    * its own parts' records in TPsot order. PPT: the tile's parts'
    * Zppt-ordered payloads concatenate directly (no length records). */
  private def headerStreamFor(hd: MainHeader,
      segs: Vector[PartRec]): Option[Array[Byte]] = hd.ppm match {
    case Some(stream) =>
      // split the PPM stream into per-tile-part records once per call:
      // records are few (one per tile-part) and the split is O(bytes)
      val bb = ByteBuffer.wrap(stream).order(ByteOrder.BIG_ENDIAN)
      val recs = new ArrayBuffer[(Int, Int)]() // (offset, len) into stream
      var p = 0
      while (p + 4 <= stream.length) {
        val n = bb.getInt(p)
        require(n >= 0 && p + 4 + n <= stream.length,
          "jpeg2000: PPM record overruns the marker payloads")
        recs += ((p + 4, n))
        p += 4 + n
      }
      require(p == stream.length, "jpeg2000: trailing PPM bytes")
      val total = segs.map(s => {
        require(s.ordinal < recs.length,
          s"jpeg2000: no PPM record for tile-part ordinal ${s.ordinal}")
        recs(s.ordinal)._2
      }).sum
      val arr = new Array[Byte](total)
      var off = 0
      segs.foreach { s =>
        val (o, n) = recs(s.ordinal)
        System.arraycopy(stream, o, arr, off, n); off += n
      }
      Some(arr)
    case None =>
      if (segs.forall(_.ppt.isEmpty)) None
      else Some {
        val chunks = segs.flatMap { s =>
          require(s.ppt.map(_._1).distinct.length == s.ppt.length,
            "jpeg2000: duplicate Zppt index in one tile-part")
          s.ppt.sortBy(_._1).map(_._2)
        }
        val arr = new Array[Byte](chunks.map(_.length).sum)
        var off = 0
        chunks.foreach { c =>
          System.arraycopy(c, 0, arr, off, c.length); off += c.length }
        arr
      }
  }

  /** The coded payload of one tile: (buffer, start, end). Single
    * tile-part streams alias the original buffer (no copy); multi-part
    * tiles concatenate their payload segments, clamping a truncated
    * final segment at the buffer edge (prefix reads). */
  private def tilePayload(bytes: Array[Byte],
      segs: Vector[PartRec]): (Array[Byte], Int, Int) =
    if (segs.length == 1) (bytes, segs.head.sod, segs.head.end)
    else {
      val clamped = segs.map { p =>
        (p.sod, math.max(p.sod, math.min(p.end, bytes.length))) }
      val total = clamped.map { case (s, e) => e - s }.sum
      val arr = new Array[Byte](total)
      var off = 0
      clamped.foreach { case (s, e) =>
        System.arraycopy(bytes, s, arr, off, e - s); off += e - s }
      // a mid-stream part may still DECLARE more bytes than the buffer
      // holds (truncated fetch): report the declared total so the packet
      // loop's truncation guard fires instead of decoding short data as
      // if complete
      val declared = segs.map(p => p.end - p.sod).sum
      (arr, 0, declared)
    }

  /** Diagnostic ONLY: code-blocks entropy-decoded by the most recent
    * decode call ON THIS THREAD (thread-local — safe under Spark's
    * task parallelism). Tests assert the windowed decode's selective
    * EBCOT actually skips work; never feeds product logic. */
  private[sources] val lastEbcotBlocks = new ThreadLocal[Integer] {
    override def initialValue: Integer = -1
  }

  private def decode(bytes: Array[Byte], discardLevels: Int,
      window: Option[(Int, Int, Int, Int)]): Seq[Plane] = {
    lastEbcotBlocks.set(0)
    val hd = parseMainHeader(bytes)
    import hd.{w, h, tw, th, nc, nl, mct}
    val depths = hd.depths
    val signedA = hd.signed
    // with per-component level overrides the reduced decode is bounded
    // by the SHALLOWEST pyramid (every component must still reach the
    // requested scale)
    val nlMin = (0 until nc).map(hd.nlOf).min
    require(discardLevels >= 0 && discardLevels <= nlMin,
      s"jpeg2000: cannot discard $discardLevels of $nlMin decomposition levels")
    require(!hd.multiTile || (tw % (1 << nl) == 0 && th % (1 << nl) == 0),
      s"jpeg2000: tile grid ${tw}x$th not aligned to 2^levels=${1 << nl} " +
        "(canvas parity) unsupported")
    // the window is in OUTPUT coordinates: full-resolution pixels when
    // discardLevels = 0, level-d reduced pixels otherwise
    window.foreach { case (wx, wy, wwid, whgt) =>
      require(wx + wwid <= lowLen(w, discardLevels) &&
        wy + whgt <= lowLen(h, discardLevels),
        s"jpeg2000: window ($wx,$wy,$wwid,$whgt) outside " +
          s"${lowLen(w, discardLevels)}x${lowLen(h, discardLevels)}")
    }
    val rMax = nl - discardLevels
    val parts = scanTileParts(bytes, hd)
    val d = discardLevels

    // ---- one tile: packet decode + inverse DWT, all tile-local ----
    // (a tile is an independent codestream body over its own canvas
    // region; tile origins are multiples of the 2^nl-aligned tile size,
    // so tile-local coordinates keep global parity at every level)
    // shared packet + EBCOT stage: SIGNED coefficient planes in the
    // quadrant layout (lossless 5/3 integers, or lossy quantizer indices)
    def decodeTileCoeffs(buf: Array[Byte], tcw: Int, tch: Int,
        sodAt: Int, tileEnd: Int,
        win: Option[(Int, Int, Int, Int)],
        hdrStream: Option[Array[Byte]] = None,
        tilePoc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
        tileRoi: Map[Int, Int] = Map.empty): Array[Array[Int]] = {
      // tile-part RGN entries override the main header's PER COMPONENT
      // (A.6.3 marker precedence); components without a tile-part entry
      // keep their main-header shift
      val roiEff = hd.roiShift ++ tileRoi
      // windowed decode: the per-level coefficient regions that influence
      // the window's pixels — each inverse-lifting level halves the
      // region and needs a support margin (radius <= 2 per axis per
      // level; 4 is safely over). Rects are PER COMPONENT: a subsampled
      // component's window is the canvas window under ceil-division to
      // its own plane, and its pyramid is its own level count.
      // neededAt(c)(l) is in the component's level-l coords.
      val neededAt: Array[Array[(Int, Int, Int, Int)]] = win match {
        case None => null
        case Some((wx, wy, wwid, whgt)) =>
          Array.tabulate(nc) { c =>
            val (sx, sy) = hd.ssOf(c)
            val m = 4
            val nlc = hd.nlOf(c)
            val rects = new Array[(Int, Int, Int, Int)](nlc + 1)
            rects(0) = (wx / sx, wy / sy,
              ceilDiv(wx + wwid, sx), ceilDiv(wy + whgt, sy))
            var l = 1
            while (l <= nlc) {
              val (a, b2, c2, d2) = rects(l - 1)
              rects(l) = (a / 2 - m, b2 / 2 - m, (c2 + 1) / 2 + m, (d2 + 1) / 2 + m)
              l += 1
            }
            rects
          }
      }
      @inline def cbNeeded(c: Int, level: Int, bx0: Int, by0: Int,
          bx1: Int, by1: Int): Boolean = neededAt == null || {
        val (a, b2, c2, d2) = neededAt(c)(level)
        bx0 < c2 && a < bx1 && by0 < d2 && b2 < by1
      }

      // decode packets in the SIGNALLED progression order into per-
      // component quadrant arrays (each level's bands live at their
      // offsets inside the tile plane, row stride tcw — the exact
      // inverse of the encoder's layout). A code-block may contribute to
      // several packets (one per quality layer): contributions are
      // byte ranges of ONE MQ codeword, accumulated in layer order and
      // entropy-decoded once after the packet walk.
      // per-component tile plane dims: exact for single-tile subsampled
      // streams (subsampling + tiling is refused at parse)
      def tdimsD(c: Int): (Int, Int) = {
        val (sx, sy) = hd.ssOf(c)
        (ceilDiv(tcw, sx), ceilDiv(tch, sy))
      }
      val planesT = Array.tabulate(nc) { c =>
        val (cw2, ch2) = tdimsD(c)
        new Array[Int](cw2 * ch2)
      }
      final class CbD(val band: Int, val xAbs: Int, val yAbs: Int,
          val cw: Int, val ch: Int, val use: Boolean) {
        var zbp = -1
        var np = 0
        var lblock = 3
        var included = false
        val chunks = new ArrayBuffer[(Int, Int)]() // (offset, len) in bytes
      }
      // geometry + per-code-block state per (component, resolution, band),
      // built lazily: packets of resolutions ABOVE rMax are only walked
      // (non-resolution-major orders interleave them), never decoded
      val geoms = Array.tabulate(nc, nl + 1) { (comp, r) =>
        if (r > hd.nlOf(comp)) Seq.empty[BandGeom]
        else {
          val (px, py) = hd.ppOf(r, comp)
          val (tcwC, tchC) = tdimsD(comp)
          bandGeoms(tcwC, tchC, hd.nlOf(comp), r, hd.cbExpOf(comp), px, py)
        }
      }
      val cbState = Array.ofDim[Array[CbD]](nc, nl + 1, 3)
      def stateOf(c: Int, r: Int, bi: Int, g: BandGeom): Array[CbD] = {
        if (cbState(c)(r)(bi) == null)
          cbState(c)(r)(bi) = {
            val grid = new Array[CbD](g.gw * g.gh)
            val nlc = hd.nlOf(c)
            val lvl = if (r == 0) nlc else nlc - r + 1
            for (gy <- 0 until g.gh; gx <- 0 until g.gw) {
              val x0 = gx * g.cbw; val y0 = gy * g.cbh
              val cw2 = math.min(g.cbw, g.bw - x0)
              val ch2 = math.min(g.cbh, g.bh - y0)
              grid(gy * g.gw + gx) = new CbD(g.band, x0, y0, cw2, ch2,
                cbNeeded(c, lvl, x0, y0, x0 + cw2, y0 + ch2))
            }
            grid
          }
        cbState(c)(r)(bi)
      }
      val trees = scala.collection.mutable.HashMap
        .empty[(Int, Int, Int, Int), (TagTree, TagTree)]

      // a tile-part POC replaces the main header's progression for this
      // tile (A.6.6 precedence)
      val pocEff = if (tilePoc.nonEmpty) tilePoc else hd.poc
      val seqAll = packetSeqOf(hd.order, pocEff, hd.layers, nc, hd.nlOf,
        tdimsD, (r, c) => hd.ppOf(r, c), hd.ssOf)
      // the walk may stop after the LAST packet a reduced decode needs:
      // for resolution-major orders that is a stream PREFIX (what the
      // PLT-ranged out-db fetch provides); other orders interleave, so
      // the last needed packet sits near the end and the walk covers
      // (and skips over) the high-resolution packets in between
      val lastNeeded = seqAll.lastIndexWhere(pk => pk.r <= hd.nlOf(pk.c) - d)
      // PPM/PPT: packet HEADERS read from the relocated stream with a
      // persistent bit cursor; SOP markers and packet bodies stay in the
      // bitstream (D.2/D.3 — EPH terminates headers wherever they live)
      val hbuf = hdrStream.orNull
      var hp = 0
      var p = sodAt
      var pi = 0
      while (pi <= lastNeeded) {
        val pk = seqAll(pi)
        // SOP resync marker before the header (D.2) — skip when present;
        // a packet header's first byte may be 0xFF but its second then
        // has a clear msb (bit-stuffing), so 0xFF91 here is unambiguous
        if (hd.sop && p + 1 < buf.length && (buf(p) & 0xFF) == 0xFF &&
            (buf(p + 1) & 0xFF) == 0x91)
          p += 6
        val br = if (hbuf == null) new BitReader(buf, p)
          else new BitReader(hbuf, hp)
        val contribs = new ArrayBuffer[(CbD, Int)]() // (cb, contribution len)
        if (br.bit() == 1) {
          geoms(pk.c)(pk.r).zipWithIndex.foreach { case (g, bi) =>
            val (gx0, gy0, gx1, gy1) = g.cbRect(pk.pix, pk.piy)
            if (gx0 < gx1 && gy0 < gy1) {
              val grid = stateOf(pk.c, pk.r, bi, g)
              val (incl, zbpT) = trees.getOrElseUpdate((pk.r, pk.c, pk.p, bi),
                (new TagTree(gx1 - gx0, gy1 - gy0),
                  new TagTree(gx1 - gx0, gy1 - gy0)))
              for (gy <- gy0 until gy1; gx <- gx0 until gx1) {
                val cbRec = grid(gy * g.gw + gx)
                var contributes = false
                if (!cbRec.included) {
                  val v = incl.decode(br, gx - gx0, gy - gy0, pk.l + 1)
                  if (v <= pk.l) { // first inclusion is in THIS layer
                    cbRec.included = true
                    contributes = true
                    var thr = 1
                    var zbp = Int.MaxValue
                    while (zbp == Int.MaxValue && thr <= 64) {
                      zbp = zbpT.decode(br, gx - gx0, gy - gy0, thr)
                      thr += 1
                    }
                    require(zbp != Int.MaxValue, "jpeg2000: runaway zbp tag tree")
                    cbRec.zbp = zbp
                  }
                } else contributes = br.bit() == 1
                if (contributes) {
                  val npL = readPassCount(br)
                  var extra = 0
                  while (br.bit() == 1) extra += 1
                  cbRec.lblock += extra
                  val len = br.bits(cbRec.lblock + floorLog2(npL))
                  cbRec.np += npL
                  contribs += ((cbRec, len))
                }
              }
            }
          }
        }
        if (hbuf == null) {
          p = br.align()
          if (hd.eph) { // EPH terminates every packet header when signalled
            require(p + 2 <= buf.length && (buf(p) & 0xFF) == 0xFF &&
              (buf(p + 1) & 0xFF) == 0x92, "jpeg2000: missing EPH marker")
            p += 2
          }
        } else {
          hp = br.align()
          if (hd.eph) { // EPH lives with the header in the PPM/PPT stream
            require(hp + 2 <= hbuf.length && (hbuf(hp) & 0xFF) == 0xFF &&
              (hbuf(hp + 1) & 0xFF) == 0x92, "jpeg2000: missing EPH marker")
            hp += 2
          }
        }
        // bodies follow the header in the same code-block order
        contribs.foreach { case (cbRec, len) =>
          require(p + len <= buf.length, "jpeg2000: truncated code-block body")
          cbRec.chunks += ((p, len))
          p += len
        }
        pi += 1
      }
      require(p <= tileEnd, "jpeg2000: packet data overruns the tile")
      // entropy-decode each needed code-block ONCE over its concatenated
      // contributions; windowed decode skips the EBCOT work of
      // code-blocks outside the needed pyramid
      for {
        r <- 0 to rMax
        comp <- 0 until nc
        if r <= hd.nlOf(comp) - d
        (g, bi) <- geoms(comp)(r).zipWithIndex
        grid = cbState(comp)(r)(bi)
        if grid != null
        cbRec <- grid
        if cbRec.included && cbRec.use && cbRec.np > 0
      } {
        val total = cbRec.chunks.map(_._2).sum
        val seg = new Array[Byte](total)
        var off = 0
        cbRec.chunks.foreach { case (o, len) =>
          System.arraycopy(buf, o, seg, off, len)
          off += len
        }
        val mb = hd.mbOf(comp, r, cbRec.band, roiEff)
        lastEbcotBlocks.set(lastEbcotBlocks.get + 1)
        val (mag, neg) = decodeCb(cbRec.band, cbRec.cw, cbRec.ch, seg,
          cbRec.np, mb, cbRec.zbp)
        val strideC = tdimsD(comp)._1
        // RGN maxshift (E.1): magnitudes >= 2^SPrgn are ROI coefficients
        // the encoder scaled UP by SPrgn — undo exactly; anything below
        // is background, guaranteed < 2^SPrgn by the maxshift contract
        val roiS = roiEff.getOrElse(comp, 0)
        val roiBound = 1 << roiS
        var y = 0
        while (y < cbRec.ch) {
          var x = 0
          while (x < cbRec.cw) {
            var v0 = mag(y * cbRec.cw + x)
            if (roiS > 0 && v0 >= roiBound) v0 >>= roiS
            val v = if (neg(y * cbRec.cw + x)) -v0 else v0
            planesT(comp)((g.yOff + cbRec.yAbs + y) * strideC +
              (g.xOff + cbRec.xAbs + x)) = v
            x += 1
          }
          y += 1
        }
      }
      planesT
    }

    def decodeTile(buf: Array[Byte], tcw: Int, tch: Int,
        sodAt: Int, tileEnd: Int,
        win: Option[(Int, Int, Int, Int)],
        hdrStream: Option[Array[Byte]] = None,
        tilePoc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
        tileRoi: Map[Int, Int] = Map.empty): IndexedSeq[Array[Int]] = {
      val planesT = decodeTileCoeffs(buf, tcw, tch, sodAt, tileEnd, win,
        hdrStream, tilePoc, tileRoi)
      // inverse DWT per component — at the component's OWN level count
      // and OWN (subsampled) plane dims — stopping at the requested
      // level: the level-`discardLevels` LL region is the reduced tile
      (0 until nc).map { comp =>
        val (sx, sy) = hd.ssOf(comp)
        val tcwC = ceilDiv(tcw, sx)
        val tchC = ceilDiv(tch, sy)
        val full = planesT(comp)
        var l = hd.nlOf(comp)
        while (l >= d + 1) {
          val cw2 = lowLen(tcwC, l - 1)
          val ch2 = lowLen(tchC, l - 1)
          // gather the cw2 x ch2 region (stored at the top-left of full)
          val sub = new Array[Int](cw2 * ch2)
          var y = 0
          while (y < ch2) {
            System.arraycopy(full, y * tcwC, sub, y * cw2, cw2)
            y += 1
          }
          val invd = inv2d(sub, cw2, ch2)
          y = 0
          while (y < ch2) {
            System.arraycopy(invd, y * cw2, full, y * tcwC, cw2)
            y += 1
          }
          l -= 1
        }
        // crop to the tile-local window (windowed mode) or the reduced
        // LL — the window is in canvas coords; a subsampled component
        // crops its ceil-division image of it (d = 0 there by contract)
        val (cx0, cy0, fw, fh) = win match {
          case Some((wx, wy, wwid, whgt)) =>
            (wx / sx, wy / sy,
              ceilDiv(wx + wwid, sx) - wx / sx,
              ceilDiv(wy + whgt, sy) - wy / sy)
          case None => (0, 0, lowLen(tcwC, d), lowLen(tchC, d))
        }
        val outA = new Array[Int](fw * fh)
        var y = 0
        while (y < fh) {
          var x = 0
          while (x < fw) {
            outA(y * fw + x) = full((cy0 + y) * tcwC + (cx0 + x))
            x += 1
          }
          y += 1
        }
        outA
      }
    }

    // lossy tile: dequantize the indices per subband (midpoint
    // reconstruction v = sign * (|q| + 0.5) * Δ̂_b for q != 0 — E.4.1.2
    // with r = 1/2), then the inverse 9/7 pyramid on doubles
    def decodeTileLossy(buf: Array[Byte], tcw: Int, tch: Int,
        sodAt: Int, tileEnd: Int,
        win: Option[(Int, Int, Int, Int)],
        hdrStream: Option[Array[Byte]] = None,
        tilePoc: Seq[(Int, Int, Int, Int, Int, Int)] = Nil,
        tileRoi: Map[Int, Int] = Map.empty): IndexedSeq[Array[Double]] = {
      val planesT = decodeTileCoeffs(buf, tcw, tch, sodAt, tileEnd, win,
        hdrStream, tilePoc, tileRoi)
      (0 until nc).map { comp =>
        val (sx, sy) = hd.ssOf(comp)
        val tcwC = ceilDiv(tcw, sx)
        val tchC = ceilDiv(tch, sy)
        val q = planesT(comp)
        val nlc = hd.nlOf(comp)
        val full = new Array[Double](tcwC * tchC)
        if (hd.trOf(comp) == 1) {
          // reversible component inside a (mixed) lossy stream: raw 5/3
          // integers, EXACT integer inverse lifting, then to doubles for
          // the shared assembly (rint at the end is the identity)
          var l = nlc
          while (l >= d + 1) {
            val cw2 = lowLen(tcwC, l - 1)
            val ch2 = lowLen(tchC, l - 1)
            val sub = new Array[Int](cw2 * ch2)
            var y = 0
            while (y < ch2) {
              System.arraycopy(q, y * tcwC, sub, y * cw2, cw2)
              y += 1
            }
            val invd = inv2d(sub, cw2, ch2)
            y = 0
            while (y < ch2) {
              System.arraycopy(invd, y * cw2, q, y * tcwC, cw2)
              y += 1
            }
            l -= 1
          }
          var i = 0
          while (i < tcwC * tchC) { full(i) = q(i).toDouble; i += 1 }
        } else {
        def dequantRegion(r: Int, band: Int, bw: Int, bh: Int,
            xOff: Int, yOff: Int): Unit = {
          val delta = hd.stepHatOf(comp, r, band)
          var y = 0
          while (y < bh) {
            var x = 0
            while (x < bw) {
              val i = (yOff + y) * tcwC + (xOff + x)
              val qi = q(i)
              full(i) =
                if (qi == 0) 0.0
                else if (qi > 0) (qi + 0.5) * delta
                else -((-qi + 0.5) * delta)
              x += 1
            }
            y += 1
          }
        }
        for (r <- 0 to nlc;
            (band, bw, bh, xOff, yOff) <- bandsOf(tcwC, tchC, nlc, r))
          dequantRegion(r, band, bw, bh, xOff, yOff)
        var l = nlc
        while (l >= d + 1) {
          val cw2 = lowLen(tcwC, l - 1)
          val ch2 = lowLen(tchC, l - 1)
          val sub = new Array[Double](cw2 * ch2)
          var y = 0
          while (y < ch2) {
            System.arraycopy(full, y * tcwC, sub, y * cw2, cw2)
            y += 1
          }
          val invd = inv2d97(sub, cw2, ch2)
          y = 0
          while (y < ch2) {
            System.arraycopy(invd, y * cw2, full, y * tcwC, cw2)
            y += 1
          }
          l -= 1
        }
        }
        val (cx0, cy0, fw, fh) = win match {
          case Some((wx, wy, wwid, whgt)) =>
            (wx / sx, wy / sy,
              ceilDiv(wx + wwid, sx) - wx / sx,
              ceilDiv(wy + whgt, sy) - wy / sy)
          case None => (0, 0, lowLen(tcwC, d), lowLen(tchC, d))
        }
        val outA = new Array[Double](fw * fh)
        var y = 0
        while (y < fh) {
          var x = 0
          while (x < fw) {
            outA(y * fw + x) = full((cy0 + y) * tcwC + (cx0 + x))
            x += 1
          }
          y += 1
        }
        outA
      }
    }

    // ---- lossy (9/7) assembly: doubles end-to-end, then the inverse
    // ICT and a rounded, clamped DC unshift ----
    def assembleLossy(): Seq[Plane] = {
      val (fw, fh) = window match {
        case Some((_, _, wwid, whgt)) => (wwid, whgt)
        case None => (lowLen(w, d), lowLen(h, d))
      }
      val assembled = Array.fill(nc)(new Array[Double](fw * fh))
      for (ty <- 0 until hd.nty; tx <- 0 until hd.ntx) {
        val ti = ty * hd.ntx + tx
        val tx0 = tx * tw; val ty0 = ty * th
        val tcw = math.min(tw, w - tx0)
        val tch = math.min(th, h - ty0)
        val rx0 = tx0 >> d; val ry0 = ty0 >> d
        val rw = lowLen(tcw, d); val rh = lowLen(tch, d)
        val (ix0, iy0, ix1, iy1) = window match {
          case Some((wx, wy, wwid, whgt)) =>
            (math.max(rx0, wx), math.max(ry0, wy),
              math.min(rx0 + rw, wx + wwid), math.min(ry0 + rh, wy + whgt))
          case None => (rx0, ry0, rx0 + rw, ry0 + rh)
        }
        if (ix0 < ix1 && iy0 < iy1) {
          val segsT = parts.getOrElse(ti, throw new IllegalArgumentException(
            s"jpeg2000: tile-part for needed tile $ti missing from the stream"))
          val (tbuf, sod, tileEnd) = tilePayload(bytes, segsT)
          val localWin =
            if (d == 0) window.map(_ => (ix0 - tx0, iy0 - ty0, ix1 - ix0, iy1 - iy0))
            else None
          val tilePlanes = decodeTileLossy(tbuf, tcw, tch, sod, tileEnd,
            localWin, headerStreamFor(hd, segsT), segsT.head.poc,
            segsT.head.roi)
          val (px, py, pw2, ph2) = window match {
            case Some((wx, wy, _, _)) => (ix0 - wx, iy0 - wy, ix1 - ix0, iy1 - iy0)
            case None => (rx0, ry0, rw, rh)
          }
          val (sx, sy, srcW) =
            if (d == 0) (0, 0, pw2)
            else (ix0 - rx0, iy0 - ry0, rw)
          for (comp <- 0 until nc) {
            val src = tilePlanes(comp)
            var y = 0
            while (y < ph2) {
              System.arraycopy(src, (sy + y) * srcW + sx,
                assembled(comp), (py + y) * fw + px, pw2)
              y += 1
            }
          }
        }
      }
      if (mct == 1) {
        require(nc >= 3, "jpeg2000: MCT declared with fewer than 3 components")
        val ya = assembled(0); val cba = assembled(1); val cra = assembled(2)
        var i = 0
        while (i < fw * fh) {
          val r0 = ya(i) + 1.402 * cra(i)
          val g0 = ya(i) - 0.344136 * cba(i) - 0.714136 * cra(i)
          val b0 = ya(i) + 1.772 * cba(i)
          ya(i) = r0; cba(i) = g0; cra(i) = b0
          i += 1
        }
      }
      (0 until nc).map { comp =>
        val a = assembled(comp)
        val depth = depths(comp)
        val shift = if (signedA(comp)) 0 else 1 << (depth - 1)
        val lo = if (signedA(comp)) -(1 << (depth - 1)) else 0
        val hi = if (signedA(comp)) (1 << (depth - 1)) - 1 else (1 << depth) - 1
        val outA = new Array[Int](a.length)
        var i = 0
        while (i < a.length) {
          val v = math.rint(a(i)).toInt + shift
          outA(i) = math.max(lo, math.min(hi, v))
          i += 1
        }
        Plane(fw, fh, depth, signedA(comp), outA)
      }
    }
    // SUBSAMPLED streams (SIZ XRsiz/YRsiz > 1): single-tile by parse
    // contract, components decode at their OWN plane dims and come back
    // as differently-sized Planes (the 4:2:0 chroma shape) — assembly is
    // a per-component wrap, no canvas stitching. A WINDOW is given in
    // canvas coordinates (level-d reduced canvas coordinates when
    // discardLevels > 0); each component returns its ceil-division image
    // of it. Full-resolution windows run the selective-EBCOT path inside
    // the tile decode; reduced windows decode the whole (already
    // prefix-small) reduced planes and crop per component — the same
    // split the tiled path uses. The reduced crop rect is the
    // ceil-division transform applied in REDUCED units, which equals the
    // full-resolution composition exactly because nested ceil-divisions
    // compose: ceil(ceil(n/2^d)/s) == ceil(n/(s*2^d)) == ceil(ceil(n/s)/2^d)
    // (and floor compositions likewise for the origin). Both window
    // shapes are differential-tested against full-decode-then-crop.
    if (hd.subsampled) {
      val segs0 = parts.getOrElse(0, throw new IllegalArgumentException(
        "jpeg2000: tile 0 missing from the stream"))
      val (tbuf, sod, tileEnd) = tilePayload(bytes, segs0)
      val hdrS = headerStreamFor(hd, segs0)
      val anyLossy = (0 until nc).exists(c => hd.trOf(c) == 0)
      // per-component output dims: the window's ceil-division image, or
      // the component's (possibly reduced) full plane
      def outDims(comp: Int): (Int, Int) = {
        val (sx, sy) = hd.ssOf(comp)
        window match {
          case Some((wx, wy, wwid, whgt)) =>
            (ceilDiv(wx + wwid, sx) - wx / sx, ceilDiv(wy + whgt, sy) - wy / sy)
          case None => (lowLen(ceilDiv(w, sx), d), lowLen(ceilDiv(h, sy), d))
        }
      }
      val pocT0 = segs0.head.poc
      val roiT0 = segs0.head.roi
      // a reduced-coordinate window cannot seed the selective-EBCOT
      // needed-set recursion (it is anchored at full resolution), so
      // d > 0 decodes the whole reduced planes and crops here instead
      val winDec = if (d == 0) window else None
      // crop a component's full reduced plane (row stride = its reduced
      // width) to the window's reduced ceil-division rect; identity
      // when the tile decode already cropped (winDec == window)
      def cropRed[T](comp: Int, a: Array[T], mk: Int => Array[T]): Array[T] =
        (window, winDec) match {
          case (Some((wx, wy, _, _)), None) =>
            val (sx, sy) = hd.ssOf(comp)
            val fullW = lowLen(ceilDiv(w, sx), d)
            val (fw, fh) = outDims(comp)
            val out = mk(fw * fh)
            val x0 = wx / sx; val y0 = wy / sy
            var y = 0
            while (y < fh) {
              System.arraycopy(a, (y0 + y) * fullW + x0, out, y * fw, fw)
              y += 1
            }
            out
          case _ => a
        }
      return if (anyLossy) {
        val tp = decodeTileLossy(tbuf, w, h, sod, tileEnd, winDec, hdrS,
          pocT0, roiT0)
        (0 until nc).map { comp =>
          val (fw, fh) = outDims(comp)
          val a = cropRed(comp, tp(comp), n => new Array[Double](n))
          val depth = depths(comp)
          val shift = if (signedA(comp)) 0 else 1 << (depth - 1)
          val lo = if (signedA(comp)) -(1 << (depth - 1)) else 0
          val hi = if (signedA(comp)) (1 << (depth - 1)) - 1 else (1 << depth) - 1
          val outA = new Array[Int](fw * fh)
          var i = 0
          while (i < outA.length) {
            val v = math.rint(a(i)).toInt + shift
            outA(i) = math.max(lo, math.min(hi, v))
            i += 1
          }
          Plane(fw, fh, depth, signedA(comp), outA)
        }
      } else {
        val tp = decodeTile(tbuf, w, h, sod, tileEnd, winDec, hdrS,
          pocT0, roiT0)
        (0 until nc).map { comp =>
          val (fw, fh) = outDims(comp)
          val a = cropRed(comp, tp(comp), n => new Array[Int](n))
          val shift = if (signedA(comp)) 0 else 1 << (depths(comp) - 1)
          var i = 0
          while (i < a.length) { a(i) += shift; i += 1 }
          Plane(fw, fh, depths(comp), signedA(comp), a)
        }
      }
    }

    // lossy/double assembly whenever ANY component is 9/7 (mixed streams
    // run their 5/3 components through the exact integer inverse inside
    // decodeTileLossy, so rint+clamp at the end is the identity for
    // them); the all-5/3 stream keeps the integer path below
    if ((0 until nc).exists(c => hd.trOf(c) == 0)) return assembleLossy()

    // ---- assemble tiles into the output canvas ----
    // (output coordinates: level-d reduced when d > 0; tile origins are
    // 2^nl-aligned so the reduced tile origins abut exactly:
    // lowLen(w, d) - tx0/2^d == lowLen(w - tx0, d))
    val (fw, fh) = window match {
      case Some((_, _, wwid, whgt)) => (wwid, whgt)
      case None => (lowLen(w, d), lowLen(h, d))
    }
    val assembled = Array.fill(nc)(new Array[Int](fw * fh))
    for (ty <- 0 until hd.nty; tx <- 0 until hd.ntx) {
      val ti = ty * hd.ntx + tx
      val tx0 = tx * tw; val ty0 = ty * th
      val tcw = math.min(tw, w - tx0)
      val tch = math.min(th, h - ty0)
      // tile rect in OUTPUT coordinates
      val rx0 = tx0 >> d; val ry0 = ty0 >> d
      val rw = lowLen(tcw, d); val rh = lowLen(tch, d)
      // intersection with the window (full tile when no window)
      val (ix0, iy0, ix1, iy1) = window match {
        case Some((wx, wy, wwid, whgt)) =>
          (math.max(rx0, wx), math.max(ry0, wy),
            math.min(rx0 + rw, wx + wwid), math.min(ry0 + rh, wy + whgt))
        case None => (rx0, ry0, rx0 + rw, ry0 + rh)
      }
      if (ix0 < ix1 && iy0 < iy1) {
        val segsT = parts.getOrElse(ti, throw new IllegalArgumentException(
          s"jpeg2000: tile-part for needed tile $ti missing from the stream"))
        val (tbuf, sod, tileEnd) = tilePayload(bytes, segsT)
        // full-resolution windows crop INSIDE the tile decode (that is
        // what lets it skip EBCOT work); reduced windows decode the
        // whole (already prefix-small) reduced tile and crop on copy
        val localWin =
          if (d == 0) window.map(_ => (ix0 - tx0, iy0 - ty0, ix1 - ix0, iy1 - iy0))
          else None
        val tilePlanes = decodeTile(tbuf, tcw, tch, sod, tileEnd, localWin,
          headerStreamFor(hd, segsT), segsT.head.poc, segsT.head.roi)
        val (px, py, pw2, ph2) = window match {
          case Some((wx, wy, _, _)) => (ix0 - wx, iy0 - wy, ix1 - ix0, iy1 - iy0)
          case None => (rx0, ry0, rw, rh)
        }
        // source offset inside the decoded tile planes: 0 when the tile
        // decode already cropped (d == 0 window), the reduced-local
        // intersection origin otherwise
        val (sx, sy, srcW) =
          if (d == 0) (0, 0, pw2)
          else (ix0 - rx0, iy0 - ry0, rw)
        for (comp <- 0 until nc) {
          val src = tilePlanes(comp)
          var y = 0
          while (y < ph2) {
            System.arraycopy(src, (sy + y) * srcW + sx,
              assembled(comp), (py + y) * fw + px, pw2)
            y += 1
          }
        }
      }
    }

    // inverse RCT (per-pixel, so valid at any reduced resolution or
    // window), then the DC level unshift
    if (mct == 1) {
      require(nc >= 3, "jpeg2000: MCT declared with fewer than 3 components")
      val ya = assembled(0); val cba = assembled(1); val cra = assembled(2)
      var i = 0
      while (i < fw * fh) {
        val g = ya(i) - ((cba(i) + cra(i)) >> 2)
        ya(i) = cra(i) + g  // R
        val b = cba(i) + g
        cba(i) = g          // G
        cra(i) = b          // B
        i += 1
      }
    }
    (0 until nc).map { comp =>
      val a = assembled(comp)
      val shift = if (signedA(comp)) 0 else 1 << (depths(comp) - 1)
      var i = 0
      while (i < a.length) { a(i) += shift; i += 1 }
      Plane(fw, fh, depths(comp), signedA(comp), a)
    }
  }

  /** Flat index of band coordinate (x, y) of level `l` inside the w-wide
    * full-plane quadrant layout: at level l the quadrants live inside
    * the level-(l-1) LL region, rows of width lowLen(w, l-1) — but all
    * regions share the full plane's row stride at their top-left. */
  private def levelIndex(w: Int, nl: Int, l: Int, destW: Int,
      x: Int, y: Int): Int = y * w + x

  /** Header-only (w, h, components, decomposition levels) from the
    * SIZ/COD markers — bounded work, no entropy decoding; accepts a
    * prefix of the file as long as it covers the main header. */
  def info(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val csOff = codestreamOffsetOf(bytes)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = csOff + 2
    var w = -1; var h = -1; var nc = -1; var nl = -1
    var sane = true
    while (sane && (w < 0 || nl < 0) && pos + 4 <= bytes.length) {
      val marker = bb.getShort(pos) & 0xFFFF
      if ((marker >> 8) != 0xFF) sane = false
      else {
        marker match {
          case 0xFF51 =>
            w = bb.getInt(pos + 6); h = bb.getInt(pos + 10)
            nc = bb.getShort(pos + 38) & 0xFFFF
          case 0xFF52 => nl = bb.get(pos + 9) & 0xFF
          case _ =>
        }
        pos += 2 + (bb.getShort(pos + 2) & 0xFFFF)
      }
    }
    require(w > 0 && nl >= 0, "jpeg2000: SIZ/COD not found in header bytes")
    (w, h, nc, nl)
  }

  /** Full main-header layout from a header PREFIX (tile grid, exponent
    * tables, first-SOT offset) — the out-db loader's entry point for
    * tile-ranged reads. Header-bounded: nothing past the first SOT is
    * touched, and JP2 boxes are parsed in place. */
  private[sources] def layout(bytes: Array[Byte]): MainHeader =
    parseMainHeader(bytes)

  /** Tile-part byte ranges (absolute file offsets, SOT inclusive) from
    * the TLM marker this encoder writes into the main header: entry i is
    * tile i's (start, length). None when the stream carries no TLM or
    * the header probe is too short. A windowed out-db read then FETCHES
    * only the tiles the window intersects. */
  private[sources] def tileRangesFromTlm(
      head: Array[Byte]): Option[IndexedSeq[IndexedSeq[(Long, Int)]]] = {
    val hd = try parseMainHeader(head) catch { case _: Exception => return None }
    // PPM records key on the GLOBAL tile-part ordinal: a stitched stream
    // holding only some tiles would misalign every record — full fetch
    if (hd.ppm.isDefined) return None
    val bb = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN)
    var pos = hd.csOff + 2
    // (tile index or -1 for "in index order", length) per tile-part,
    // accumulated across TLM segments in stream order
    val entries = new ArrayBuffer[(Int, Int)]()
    while (pos < hd.firstSot) {
      val marker = bb.getShort(pos) & 0xFFFF
      if (marker == 0xFF55) { // TLM
        val end = pos + 2 + (bb.getShort(pos + 2) & 0xFFFF)
        val stlm = head(pos + 5) & 0xFF
        val st = (stlm >> 4) & 3
        val sp = (stlm >> 6) & 1
        if (sp != 1 || st == 3) return None // 32-bit Ptlm layouts only
        var q = pos + 6
        val entryLen = 4 + st
        while (q + entryLen <= end) {
          val ti = st match {
            case 0 => -1
            case 1 => head(q) & 0xFF
            case _ => bb.getShort(q) & 0xFFFF
          }
          entries += ti -> bb.getInt(q + st)
          q += entryLen
        }
      }
      pos += 2 + (bb.getShort(pos + 2) & 0xFFFF)
    }
    if (entries.isEmpty) return None
    val nTiles = hd.ntx * hd.nty
    val parts = Array.fill(nTiles)(new ArrayBuffer[(Long, Int)]())
    var off = hd.firstSot.toLong
    entries.zipWithIndex.foreach { case ((ti0, len), i) =>
      val ti = if (ti0 < 0) i else ti0 // Ttlm omitted: index order, one each
      if (ti >= nTiles) return None
      parts(ti) += ((off, len))
      off += len
    }
    Some(parts.map(_.toIndexedSeq).toIndexedSeq)
  }

  /** Number of LEADING packets that cover resolutions 0..rMax of one
    * tile, or None when the progression order interleaves resolutions
    * (LRCP with several layers, PCRL, CPRL) — then no prefix is
    * sufficient and callers fall back to a full fetch. */
  private def leadingPacketCount(hd: MainHeader, tcw: Int, tch: Int,
      rMax: Int): Option[Int] =
    // POC replaces the COD progression: "leading packets = low
    // resolutions" no longer follows from hd.order — full fetch instead
    if (hd.poc.nonEmpty || !resolutionMajor(hd.order, hd.layers)) None
    else Some((for (r <- 0 to rMax; c <- 0 until hd.nc
        if r <= hd.nlOf(c)) yield {
      val (px, py) = hd.ppOf(r, c)
      val (sx, sy) = hd.ssOf(c)
      val (npx, npy) = precGridOf(ceilDiv(tcw, sx), ceilDiv(tch, sy),
        hd.nlOf(c), r, px, py)
      hd.layers * npx * npy
    }).sum)

  /** FILE-byte length of the prefix sufficient to decode resolutions
    * 0..NL-discard, computed from the PLT packet-length marker this
    * encoder writes: header bytes + the leading packets of resolutions
    * 0..NL-discard (layers x components x precincts each). None when the
    * stream carries no PLT (foreign encoders may omit it), the header
    * probe is too short, or the progression order is not resolution-
    * major. A reduced-resolution out-db read then FETCHES only this
    * prefix — megabytes instead of a whole scene. */
  def prefixLenFor(head: Array[Byte], discard: Int): Option[Int] = {
    val hd = try parseMainHeader(head) catch { case _: Exception => return None }
    // single-tile streams only: a multi-tile codestream interleaves
    // every tile's packets, so "leading packets" is per tile-part
    // there (the out-db loader stitches per-tile prefixes instead)
    if (hd.multiTile ||
        discard > (0 until hd.nc).map(hd.nlOf).min) return None
    val bb = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN)
    var pos = hd.firstSot
    val lens = new ArrayBuffer[Int]()
    var sodAt = -1
    // a 7-bit varint may legally straddle two PLT segments: the partial
    // accumulator carries ACROSS segments and resets only when a varint
    // completes (continuation bit clear)
    var cur = 0
    while (sodAt < 0 && pos + 4 <= head.length) {
      val marker = bb.getShort(pos) & 0xFFFF
      if ((marker >> 8) != 0xFF) return None
      marker match {
        case 0xFF58 =>
          val end = pos + 2 + (bb.getShort(pos + 2) & 0xFFFF)
          if (end > head.length) return None
          var q = pos + 5 // skip marker, Lplt, Zplt
          while (q < end) {
            val v = head(q) & 0xFF
            cur = (cur << 7) | (v & 0x7F)
            if ((v & 0x80) == 0) { lens += cur; cur = 0 }
            q += 1
          }
        case 0xFF5F =>
          // tile-part POC: the progression is no longer hd.order, so
          // "leading packets = low resolutions" may not hold
          return None
        case 0xFF93 => sodAt = pos + 2
        case _ =>
      }
      if (sodAt < 0)
        pos = if (marker == 0xFF90) pos + 12
          else pos + 2 + (bb.getShort(pos + 2) & 0xFFFF)
    }
    if (sodAt < 0) return None
    val needPackets =
      leadingPacketCount(hd, hd.w, hd.h, hd.nl - discard).getOrElse(return None)
    if (lens.length < needPackets) return None
    Some(sodAt + lens.take(needPackets).sum)
  }

  /** Byte length of the PREFIX of ONE tile-part (SOT .. SOD .. leading
    * packets) sufficient to decode its resolutions 0..nl-discard, parsed
    * from the tile-part's own PLT. `part` is a peek at the tile-part's
    * first bytes (must start at its SOT and cover SOT+PLT+SOD); `ti` is
    * the tile index (edge tiles have smaller precinct grids). None when
    * the peek is too short, carries no PLT, or the progression order is
    * not resolution-major. */
  private[sources] def tilePrefixLen(part: Array[Byte], hd: MainHeader,
      ti: Int, discard: Int): Option[Int] = {
    val (sodAt, lens) = partPacketLens(part).getOrElse(return None)
    val needPackets = neededPackets(hd, ti, discard).getOrElse(return None)
    if (lens.length < needPackets) return None
    Some(sodAt + lens.take(needPackets).sum)
  }

  /** ONE tile-part's PLT: (SOD payload offset within the part, packet
    * byte lengths listed by the part's own PLT segments). `part` must
    * start at the SOT and cover SOT..SOD; None when the peek is too
    * short or carries no complete header. */
  private[sources] def partPacketLens(
      part: Array[Byte]): Option[(Int, IndexedSeq[Int])] = {
    if (part.length < 12 || (part(0) & 0xFF) != 0xFF || (part(1) & 0xFF) != 0x90)
      return None
    val bb = ByteBuffer.wrap(part).order(ByteOrder.BIG_ENDIAN)
    var pos = 12
    val lens = new ArrayBuffer[Int]()
    var cur = 0 // varint accumulator carries across PLT segments
    var sodAt = -1
    while (sodAt < 0 && pos + 4 <= part.length) {
      val marker = bb.getShort(pos) & 0xFFFF
      if ((marker >> 8) != 0xFF) return None
      marker match {
        case 0xFF58 =>
          val end = pos + 2 + (bb.getShort(pos + 2) & 0xFFFF)
          if (end > part.length) return None
          var q = pos + 5
          while (q < end) {
            val v = part(q) & 0xFF
            cur = (cur << 7) | (v & 0x7F)
            if ((v & 0x80) == 0) { lens += cur; cur = 0 }
            q += 1
          }
        case 0xFF5F => return None // tile-part POC: prefix order unknowable
        case 0xFF93 => sodAt = pos + 2
        case _ =>
      }
      if (sodAt < 0) pos += 2 + (bb.getShort(pos + 2) & 0xFFFF)
    }
    if (sodAt < 0) None else Some((sodAt, lens.toIndexedSeq))
  }

  /** Leading packets of tile `ti` covering resolutions 0..nl-discard
    * (None when the order interleaves resolutions). */
  private[sources] def neededPackets(hd: MainHeader, ti: Int,
      discard: Int): Option[Int] = {
    if (discard > (0 until hd.nc).map(hd.nlOf).min) return None
    val tx = ti % hd.ntx; val ty = ti / hd.ntx
    val tcw = math.min(hd.tw, hd.w - tx * hd.tw)
    val tch = math.min(hd.th, hd.h - ty * hd.th)
    leadingPacketCount(hd, tcw, tch, hd.nl - discard)
  }

  /** Offset of the jp2c box PAYLOAD inside a JP2 container (walking
    * only the boxes present in the given bytes; positions held as Long
    * so a declared box length near 2 GiB cannot overflow the walk). */
  private def jp2CodestreamOffset(bytes: Array[Byte]): Option[Int] = {
    if (bytes.length < 12 || bytes(4) != 'j'.toByte || bytes(5) != 'P'.toByte)
      return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 0L
    while (pos + 8 <= bytes.length) {
      var len = bb.getInt(pos.toInt).toLong
      val boxType = new String(bytes, pos.toInt + 4, 4, "ISO-8859-1")
      var dataOff = pos + 8
      if (len == 1) { len = bb.getLong(pos.toInt + 8); dataOff = pos + 16 }
      else if (len == 0) len = bytes.length - pos
      if (boxType == "jp2c")
        return if (dataOff <= Int.MaxValue) Some(dataOff.toInt) else None
      pos += len
    }
    None
  }
}
