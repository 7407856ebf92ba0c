package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jpeg2000.Plane

/** JPEG 2000 lossless codec validation. No third-party J2K encoder
  * exists in this offline container (the codec's scaladoc documents the
  * interop caveat), so the strategy is: hand-computed fixtures for the
  * deterministic transforms (5/3 lifting, tag trees, codeword tables)
  * plus dense encode/decode roundtrip fuzz over the full feature
  * lattice — sizes x depths x signedness x levels x code-block sizes x
  * content shapes. */
class Jpeg2000Spec extends AnyFunSuite {

  // ---------------------------------------------------------------
  // 5/3 reversible DWT
  // ---------------------------------------------------------------

  test("5/3 forward matches hand-computed lifting on a small signal") {
    // x = [1, 2, 3, 4, 5, 6]; d_i = x[2i+1] - floor((x[2i]+x[2i+2])/2)
    //   d0 = 2 - floor((1+3)/2) = 0; d1 = 4 - floor((3+5)/2) = 0
    //   d2 = 6 - floor((5+5)/2) = 1          (mirror: x[6] ≡ x[4])
    // s_i = x[2i] + floor((d[i-1]+d[i]+2)/4)
    //   s0 = 1 + floor((0+0+2)/4) = 1        (mirror: d[-1] ≡ d[0])
    //   s1 = 3 + floor((0+0+2)/4) = 3; s2 = 5 + floor((0+1+2)/4) = 5
    val (s, d) = Jpeg2000.fwd53(Array(1, 2, 3, 4, 5, 6))
    assert(s.toSeq == Seq(1, 3, 5))
    assert(d.toSeq == Seq(0, 0, 1))
    assert(Jpeg2000.inv53(s, d).toSeq == Seq(1, 2, 3, 4, 5, 6))
    // a ramp is one straight line: high band ~0 everywhere (the filter's
    // vanishing-moment property, a transcription-error canary)
    val (s2, d2) = Jpeg2000.fwd53(Array.tabulate(101)(i => 7 * i))
    assert(d2.count(_ == 0) >= d2.length - 1, d2.toSeq.take(10))
    assert(Jpeg2000.inv53(s2, d2).toSeq == Seq.tabulate(101)(i => 7 * i))
  }

  test("5/3 roundtrips every length 1..40 with adversarial values") {
    val rnd = new scala.util.Random(42)
    for (n <- 1 to 40; trial <- 0 until 5) {
      val x = Array.fill(n)(trial match {
        case 0 => rnd.nextInt(256) - 128
        case 1 => rnd.nextInt(65536) - 32768
        case 2 => if (rnd.nextBoolean()) 32767 else -32768
        case 3 => 0
        case _ => rnd.nextInt(3) - 1
      })
      val (s, d) = Jpeg2000.fwd53(x)
      assert(s.length == (n + 1) / 2 && d.length == n / 2)
      assert(Jpeg2000.inv53(s, d).toSeq == x.toSeq, s"n=$n trial=$trial")
    }
  }

  // ---------------------------------------------------------------
  // Tag tree
  // ---------------------------------------------------------------

  test("tag tree: hand-traced 2x2 example and roundtrip over random grids") {
    // values [[1,2],[3,2]]: root=min=1; encoding leaf (0,0) at
    // threshold 2 resolves the root to 1 then the leaf to 1
    val bw = new Jpeg2000.BitWriter
    val t = new Jpeg2000.TagTree(2, 2)
    t.set(0, 0, 1); t.set(1, 0, 2); t.set(0, 1, 3); t.set(1, 1, 2)
    t.reset()
    for ((x, y) <- Seq((0, 0), (1, 0), (0, 1), (1, 1)))
      t.encode(bw, x, y, 4)
    val bytes = bw.finish()
    val br = new Jpeg2000.BitReader(bytes, 0)
    val td = new Jpeg2000.TagTree(2, 2)
    val got = for ((x, y) <- Seq((0, 0), (1, 0), (0, 1), (1, 1))) yield {
      var thr = 1
      var v = Int.MaxValue
      while (v == Int.MaxValue && thr <= 5) { v = td.decode(br, x, y, thr); thr += 1 }
      v
    }
    assert(got == Seq(1, 2, 3, 2))

    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (3, 1), (1, 4), (5, 3), (8, 8))) {
      val vals = Array.fill(h, w)(rnd.nextInt(6))
      val enc = new Jpeg2000.TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) enc.set(x, y, vals(y)(x))
      enc.reset()
      val bw2 = new Jpeg2000.BitWriter
      for (y <- 0 until h; x <- 0 until w) enc.encode(bw2, x, y, vals(y)(x) + 1)
      val br2 = new Jpeg2000.BitReader(bw2.finish(), 0)
      val dec = new Jpeg2000.TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) {
        var thr = 1
        var v = Int.MaxValue
        while (v == Int.MaxValue && thr <= 8) { v = dec.decode(br2, x, y, thr); thr += 1 }
        assert(v == vals(y)(x), s"($x,$y) in ${w}x$h")
      }
    }
  }

  test("packet-header bit IO honors the 0xFF stuffing rule") {
    val bw = new Jpeg2000.BitWriter
    // force a 0xFF byte then more bits: the byte after 0xFF carries 7 bits
    bw.bits(0xFF, 8)
    bw.bits(0x55, 8)
    val bytes = bw.finish()
    assert((bytes(0) & 0xFF) == 0xFF)
    assert((bytes(1) & 0x80) == 0, "bit after a 0xFF header byte must be stuffed")
    val br = new Jpeg2000.BitReader(bytes, 0)
    assert(br.bits(8) == 0xFF && br.bits(8) == 0x55)
  }

  // ---------------------------------------------------------------
  // Full codec roundtrips
  // ---------------------------------------------------------------

  private def planeOf(w: Int, h: Int, depth: Int, signed: Boolean,
      gen: (Int, Int) => Int): Plane =
    Plane(w, h, depth, signed, Array.tabulate(w * h)(i => gen(i % w, i / w)))

  private def assertRoundtrip(planes: Seq[Plane], levels: Int, cbExp: Int,
      tag: String): Unit = {
    val bytes = Jpeg2000.encode(planes, levels = levels, cbExp = cbExp)
    val back = Jpeg2000.decode(bytes)
    assert(back.length == planes.length, tag)
    planes.zip(back).zipWithIndex.foreach { case ((a, b), ci) =>
      assert(b.w == a.w && b.h == a.h && b.depth == a.depth &&
        b.signed == a.signed, s"$tag comp $ci header")
      assert(java.util.Arrays.equals(a.samples, b.samples),
        s"$tag comp $ci: first diff at " +
          a.samples.zip(b.samples).indexWhere(p => p._1 != p._2))
    }
  }

  test("lossless roundtrip: sizes x levels x code-block sizes") {
    val rnd = new scala.util.Random(20260815)
    for {
      (w, h) <- Seq((1, 1), (5, 3), (8, 8), (64, 48), (130, 70), (31, 257))
      levels <- Seq(0, 1, 3, 5)
      cbExp <- Seq(2, 4, 6)
    } {
      val p = planeOf(w, h, 8, signed = false,
        (x, y) => rnd.nextInt(256))
      assertRoundtrip(Seq(p), levels, cbExp, s"${w}x$h L$levels cb$cbExp")
    }
  }

  test("lossless roundtrip: bit depths, signedness, extreme values") {
    val rnd = new scala.util.Random(99)
    for ((depth, signed) <- Seq((1, false), (8, false), (12, false),
        (16, false), (8, true), (16, true))) {
      val lo = if (signed) -(1 << (depth - 1)) else 0
      val hi = if (signed) (1 << (depth - 1)) - 1 else (1 << depth) - 1
      val extremes = planeOf(37, 23, depth, signed,
        (x, y) => if ((x + y) % 2 == 0) lo else hi)
      assertRoundtrip(Seq(extremes), 3, 4, s"extremes d$depth s$signed")
      val random = planeOf(37, 23, depth, signed,
        (x, y) => lo + rnd.nextInt(hi - lo + 1))
      assertRoundtrip(Seq(random), 3, 4, s"random d$depth s$signed")
    }
  }

  test("lossless roundtrip: content shapes that stress the pass structure") {
    val rnd = new scala.util.Random(4242)
    // constant image: zero bitplanes everywhere after DC shift at 128?
    // no — constant 200 shifts to 72, transforms to LL-only energy:
    // most code-blocks empty -> exercises the not-included path
    assertRoundtrip(Seq(planeOf(96, 64, 8, signed = false, (_, _) => 200)),
      3, 4, "constant")
    // all-zero image (post-shift -128 everywhere): dense low bitplanes
    assertRoundtrip(Seq(planeOf(40, 40, 8, signed = false, (_, _) => 0)),
      2, 4, "zeros")
    // sparse impulses: run-length cleanup mode dominates
    assertRoundtrip(Seq(planeOf(80, 80, 8, signed = false,
      (x, y) => if (x % 17 == 3 && y % 13 == 5) 255 else 128)), 3, 6, "sparse")
    // smooth gradient: high bands near-zero, LL carries everything
    assertRoundtrip(Seq(planeOf(100, 60, 12, signed = false,
      (x, y) => (x * 25 + y * 40) % 4096)), 5, 6, "gradient")
    // per-pixel noise at full amplitude: worst-case pass density
    assertRoundtrip(Seq(planeOf(67, 41, 16, signed = true,
      (_, _) => rnd.nextInt(65536) - 32768)), 4, 5, "noise16")
  }

  test("multi-component roundtrip and mixed depths") {
    val rnd = new scala.util.Random(5)
    val r = planeOf(50, 34, 8, signed = false, (x, y) => rnd.nextInt(256))
    val g = planeOf(50, 34, 8, signed = false, (x, y) => rnd.nextInt(256))
    val b = planeOf(50, 34, 8, signed = false, (x, y) => rnd.nextInt(256))
    assertRoundtrip(Seq(r, g, b), 3, 4, "rgb")
    val deep = planeOf(50, 34, 12, signed = false, (x, y) => rnd.nextInt(4096))
    assertRoundtrip(Seq(r, deep), 2, 4, "mixed-depth")
  }

  test("reversible color transform: exact RGB roundtrip, better correlated-RGB rate") {
    val rnd = new scala.util.Random(17)
    def rt(planes: Seq[Plane], tag: String): Array[Byte] = {
      val bytes = Jpeg2000.encode(planes, levels = 3, cbExp = 4, mct = true)
      val back = Jpeg2000.decode(bytes)
      planes.zip(back).zipWithIndex.foreach { case ((a, b), ci) =>
        assert(java.util.Arrays.equals(a.samples, b.samples), s"$tag comp $ci")
      }
      bytes
    }
    // random RGB (adversarial: chroma ranges exercise the extra bit)
    rt(Seq.fill(3)(planeOf(41, 29, 8, signed = false,
      (_, _) => rnd.nextInt(256))), "random")
    // extreme corners of the RCT range
    val lo = planeOf(16, 16, 8, signed = false, (_, _) => 0)
    val hi = planeOf(16, 16, 8, signed = false, (_, _) => 255)
    rt(Seq(lo, hi, lo), "lo-hi-lo"); rt(Seq(hi, lo, hi), "hi-lo-hi")
    // 16-bit signed
    rt(Seq.fill(3)(planeOf(23, 19, 16, signed = true,
      (_, _) => rnd.nextInt(65536) - 32768)), "rgb16s")
    // correlated channels (the natural-image shape RCT exists for):
    // the transform must not LOSE to independent coding
    def lum(x: Int, y: Int) = (x * 3 + y * 5) % 200
    val cr = planeOf(64, 48, 8, signed = false, (x, y) => lum(x, y) + 20)
    val cg = planeOf(64, 48, 8, signed = false, (x, y) => lum(x, y) + 35)
    val cbp = planeOf(64, 48, 8, signed = false, (x, y) => lum(x, y) + 5)
    val withMct = rt(Seq(cr, cg, cbp), "correlated")
    val without = Jpeg2000.encode(Seq(cr, cg, cbp), levels = 3, cbExp = 4)
    assert(withMct.length <= without.length,
      s"RCT must not inflate correlated RGB: ${withMct.length} vs ${without.length}")
    // reduced-resolution decode under MCT stays well-formed (per-pixel
    // inverse applies at any scale)
    val red = Jpeg2000.decode(withMct, 1)
    assert(red.length == 3 && red.head.w == 32 && red.head.h == 24)
    // refusal paths
    intercept[IllegalArgumentException] {
      Jpeg2000.encode(Seq(lo, hi), mct = true)
    }
  }

  test("JP2 box container: the jp2c box is located and decoded") {
    val p = planeOf(16, 16, 8, signed = false, (x, y) => (x * 16 + y) % 256)
    val cs = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4)
    val out = new java.io.ByteArrayOutputStream()
    def box(tp: String, payload: Array[Byte]): Unit = {
      val len = 8 + payload.length
      out.write(Array[Byte]((len >> 24).toByte, (len >> 16).toByte,
        (len >> 8).toByte, len.toByte))
      out.write(tp.getBytes("ISO-8859-1"))
      out.write(payload)
    }
    box("jP  ", Array[Byte](0x0D, 0x0A, 0x87.toByte, 0x0A))
    box("ftyp", "jp2     jp2 ".getBytes("ISO-8859-1"))
    box("jp2c", cs)
    val back = Jpeg2000.decode(out.toByteArray)
    assert(back.length == 1 && java.util.Arrays.equals(back.head.samples, p.samples))
  }

  test("Jp2Raster: raster roundtrip preserves pixels, CRS, geotransform") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val w = 33; val h = 21
    val vals = Array.tabulate(w * h)(i => ((i * 97) % 60000).toDouble)
    val r = Raster("EPSG:32610", Array(500000.0, 10.0, 0.0, 4_000_000.0, 0.0, -10.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_16BITS")))
    val jp2 = Jp2Raster.write(r, levels = 3)
    assert(Jp2Raster.sniff(jp2))
    val back = Jp2Raster.read(jp2)
    assert(back.width == w && back.height == h)
    assert(back.crs == "EPSG:32610")
    assert(back.gt.toSeq == r.gt.toSeq)
    assert(back.bands.head.pixelTypeName == "UNSIGNED_16BITS")
    val bb = java.nio.ByteBuffer.wrap(back.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until w * h)
      assert(bb.getDouble(i * 8) == vals(i), s"pixel $i")
    // 3-band rasters route through the RCT (GDAL's RGB default) and
    // still roundtrip bit-exact with band order preserved
    val b3 = (1 to 3).map(k => Band(Double.NaN,
      RasterModel.packDoubles(Array.tabulate(w * h)(i => ((i * k * 7) % 251).toDouble)),
      ptype = "UNSIGNED_8BITS"))
    val rgb = r.copy(bands = b3.toVector)
    val backRgb = Jp2Raster.read(Jp2Raster.write(rgb, levels = 2))
    assert(backRgb.bands.length == 3)
    for (k <- 0 until 3) {
      val eb = java.nio.ByteBuffer.wrap(backRgb.bands(k).data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until w * h)
        assert(eb.getDouble(i * 8) == ((i * (k + 1) * 7) % 251).toDouble,
          s"band $k pixel $i")
    }
    // a raw codestream (no boxes) also sniffs and reads, identity grid
    val cs = Jpeg2000.encode(Seq(Plane(4, 4, 8, signed = false,
      Array.tabulate(16)(identity))))
    assert(Jp2Raster.sniff(cs))
    assert(Jp2Raster.read(cs).crs == "")
    // float bands refuse loudly
    val floaty = r.copy(bands = Vector(Band(Double.NaN,
      RasterModel.packDoubles(Array.fill(w * h)(0.5)))))
    val e = intercept[IllegalArgumentException](Jp2Raster.write(floaty))
    assert(e.getMessage.contains("integer"))
  }

  test("Jp2Raster subsampled presentation: one canvas grid, replication contract") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val w = 51; val h = 37 // odd dims: ceil-division edges exercised
    val rnd = new scala.util.Random(4200)
    // band 1 full-res arbitrary; band 2 CELL-CONSTANT on 2x2 blocks
    // (top-left decimation + replication = identity there); band 3
    // arbitrary (replication-of-decimation contract checked pointwise)
    val b1 = Array.tabulate(w * h)(_ => rnd.nextInt(256).toDouble)
    val blockVal = Array.tabulate((w + 1) / 2 * ((h + 1) / 2))(
      _ => rnd.nextInt(256).toDouble)
    val b2 = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      blockVal((y / 2) * ((w + 1) / 2) + x / 2)
    }
    val b3 = Array.tabulate(w * h)(_ => rnd.nextInt(256).toDouble)
    def band(a: Array[Double]) = Band(Double.NaN,
      RasterModel.packDoubles(a), ptype = "UNSIGNED_8BITS")
    val r = Raster("EPSG:32610", Array(100.0, 2.0, 0.0, 5000.0, 0.0, -2.0),
      w, h, Vector(band(b1), band(b2), band(b3)))
    val ss = Map(1 -> (2, 2), 2 -> (2, 2))
    val jp2 = Jp2Raster.write(r, levels = 3, subsampling = ss)
    def vals(rr: Raster, k: Int): Int => Double = {
      val bb = java.nio.ByteBuffer.wrap(rr.bands(k).data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      i => bb.getDouble(i * 8)
    }
    // full read: every band on the canvas grid
    val back = Jp2Raster.read(jp2)
    assert(back.width == w && back.height == h && back.bands.length == 3)
    val (v1, v2, v3) = (vals(back, 0), vals(back, 1), vals(back, 2))
    for (y <- 0 until h; x <- 0 until w) {
      assert(v1(y * w + x) == b1(y * w + x), s"b1 ($x,$y)")
      assert(v2(y * w + x) == b2(y * w + x), s"b2 cell-constant ($x,$y)")
      assert(v3(y * w + x) == b3((y / 2 * 2) * w + (x / 2 * 2)),
        s"b3 replication-of-decimation ($x,$y)")
    }
    // reduced read: reduced canvas dims; subsampled band = replication
    // of the codec's own reduced plane (lowLen/ceilDiv commute)
    val red = Jp2Raster.readAt(jp2, 1)
    val rw = (w + 1) / 2; val rh = (h + 1) / 2
    assert(red.width == rw && red.height == rh)
    val planesRed = Jpeg2000.decode(jp2, 1)
    val rv2 = vals(red, 1)
    for (y <- 0 until rh; x <- 0 until rw)
      assert(rv2(y * rw + x) ==
        planesRed(1).samples((y / 2) * planesRed(1).w + x / 2).toDouble,
        s"red b2 ($x,$y)")
    // out-db windowed read ≡ full-read crop (phase-offset replication)
    var fetched = 0L
    val fetch = (off: Long, n: Int) => {
      fetched += n
      java.util.Arrays.copyOfRange(jp2, off.toInt, off.toInt + n)
    }
    for ((wx, wy, ww2, wh2) <- Seq((0, 0, 6, 5), (5, 3, 11, 9),
        (w - 7, h - 4, 7, 4), (4, 2, 12, 10))) {
      val win = Jp2Raster.OutDb.loadWindow(fetch, jp2.length.toLong,
        wx, wy, ww2, wh2)
      assert(win.width == ww2 && win.height == wh2)
      for (k <- 0 until 3) {
        val wv = vals(win, k); val fv = vals(back, k)
        for (y <- 0 until wh2; x <- 0 until ww2)
          assert(wv(y * ww2 + x) == fv((wy + y) * w + wx + x),
            s"win=($wx,$wy) band=$k ($x,$y)")
      }
    }
    // out-db reduced windowed read ≡ reduced-read crop
    val winAt = Jp2Raster.OutDb.loadWindowAt(fetch, jp2.length.toLong,
      1L, 3, 2, 9, 7, Array(100.0, 4.0, 0.0, 5000.0, 0.0, -4.0), "EPSG:32610")
    assert(winAt.width == 9 && winAt.height == 7)
    for (k <- 0 until 3) {
      val wv = vals(winAt, k); val fv = vals(red, k)
      for (y <- 0 until 7; x <- 0 until 9)
        assert(wv(y * 9 + x) == fv((2 + y) * rw + 3 + x), s"redwin band=$k ($x,$y)")
    }
    // the writer refuses a subsampled component 0 (canvas anchor)
    val e = intercept[IllegalArgumentException](
      Jp2Raster.write(r, levels = 2, subsampling = Map(0 -> (2, 2))))
    assert(e.getMessage.toLowerCase.contains("subsampling"), e.getMessage)
  }

  test("reduced-resolution decode equals the forward transform's LL exactly") {
    val rnd = new scala.util.Random(321)
    val w = 53; val h = 37
    val p = planeOf(w, h, 8, signed = false, (_, _) => rnd.nextInt(256))
    val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4)
    // independent expectation: apply the 2D 5/3 forward d times to the
    // DC-shifted image and keep the LL quadrant
    def llAt(d: Int): Array[Int] = {
      var cur = p.samples.map(_ - 128)
      var cw = w; var ch = h
      for (_ <- 0 until d) {
        val lw = (cw + 1) / 2; val lh = (ch + 1) / 2
        // rows then columns, same as the codec
        val t = {
          val rows = Array.tabulate(ch) { y =>
            val (s, dd) = Jpeg2000.fwd53(cur.slice(y * cw, (y + 1) * cw))
            s ++ dd
          }
          val flat = rows.flatten
          val cols = Array.tabulate(cw) { x =>
            val col = Array.tabulate(ch)(y => flat(y * cw + x))
            val (s, dd) = Jpeg2000.fwd53(col)
            s ++ dd
          }
          Array.tabulate(ch * cw)(i => cols(i % cw)(i / cw))
        }
        val next = new Array[Int](lw * lh)
        for (y <- 0 until lh; x <- 0 until lw) next(y * lw + x) = t(y * cw + x)
        cur = next; cw = lw; ch = lh
      }
      cur.map(_ + 128)
    }
    for (d <- 0 to 3) {
      val back = Jpeg2000.decode(cs, d)
      val exp = llAt(d)
      assert(back.head.w == Jp2Raster.Jpeg2000Dims.lowLen(w, d))
      assert(back.head.samples.toSeq == exp.toSeq, s"discard $d")
    }
    // decode(d) must not read past resolution rMax's packets: a stream
    // truncated right after them still decodes the reduced image
    val full = Jpeg2000.decode(cs, 0)
    assert(full.head.samples.toSeq == p.samples.toSeq)
  }

  test("PLT prefix: reduced-resolution decode from only the leading bytes") {
    val rnd = new scala.util.Random(51)
    val w = 120; val h = 90
    val p = planeOf(w, h, 8, signed = false, (_, _) => rnd.nextInt(256))
    val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4)
    for (d <- 0 to 3) {
      val n = Jpeg2000.prefixLenFor(cs, d).get
      assert(n <= cs.length)
      val fromPrefix = Jpeg2000.decode(java.util.Arrays.copyOfRange(cs, 0, n), d)
      val fromFull = Jpeg2000.decode(cs, d)
      assert(fromPrefix.head.w == fromFull.head.w)
      assert(fromPrefix.head.samples.toSeq == fromFull.head.samples.toSeq,
        s"discard $d from ${n} of ${cs.length} bytes")
    }
    // deeper discards need strictly less of the stream; the full-res
    // prefix is the whole packet range
    val ns = (0 to 3).map(d => Jpeg2000.prefixLenFor(cs, d).get)
    assert(ns == ns.sorted.reverse && ns(3) < ns(0),
      s"prefix lengths must shrink with discard: $ns")
    // packed headers keep the prefix path: PPM lives in the MAIN header
    // and PPT in the tile-part header — both are inside every prefix,
    // and PLT lengths are in-stream (body-only) bytes, so sodAt + the
    // leading lens is still exactly the bytes a reduced decode needs
    for (ph <- Seq(1, 2)) {
      val csP = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4, order = 1,
        packedHeaders = ph)
      for (d <- 1 to 3) {
        val n = Jpeg2000.prefixLenFor(csP, d).get
        assert(n < csP.length, s"ph=$ph d=$d prefix $n")
        val fromPrefix = Jpeg2000.decode(java.util.Arrays.copyOfRange(csP, 0, n), d)
        assert(fromPrefix.head.samples.toSeq ==
          Jpeg2000.decode(csP, d).head.samples.toSeq, s"ph=$ph discard $d")
      }
    }
    // a POC stream loses the prefix path (resolution majority is
    // unknowable from hd.order) — refuses with None, never wrong bytes
    val csPoc = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4, order = 1,
      poc = Seq((0, 0, 1, 2, 1, 1), (2, 0, 1, 4, 1, 1)))
    assert(Jpeg2000.prefixLenFor(csPoc, 1).isEmpty)
  }

  test("out-db loader: header meta, overviews, reduced windowed read") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val w = 96; val h = 64
    val vals = Array.tabulate(w * h)(i => ((i * 131) % 250).toDouble)
    val r = Raster("EPSG:3857", Array(10.0, 5.0, 0.0, 9000.0, 0.0, -5.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_8BITS")))
    val f = java.io.File.createTempFile("graft_jp2_outdb", ".jp2")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, Jp2Raster.write(r, levels = 3))
    val meta = RasterLoaders.readMeta(f.getAbsolutePath)
    assert(meta.width == w && meta.height == h && meta.crs == "EPSG:3857")
    assert(meta.gt.toSeq == r.gt.toSeq && meta.bands.isEmpty, "meta is out-db")
    val ovs = RasterLoaders.overviews(f.getAbsolutePath)
    assert(ovs.map(o => (o._1, o._2, o._3)) ==
      IndexedSeq((1L, 48, 32), (2L, 24, 16), (3L, 12, 8)))
    // loadAtFactor picks the level-1 overview for a 2x decimation and
    // scales the geotransform
    val at2 = RasterLoaders.loadAtFactor(f.getAbsolutePath, 2.0)
    assert(at2.width == 48 && at2.height == 32)
    assert(at2.gt(1) == 10.0 && at2.gt(5) == -10.0)
    // the loader's reduced windowed read crops the level image and
    // re-anchors the prescaled geotransform
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    var fetched = 0L
    val fetch = (off: Long, n: Int) => {
      fetched += n
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    }
    val red = Jp2Raster.OutDb.loadWindowAt(fetch, bytes.length.toLong,
      1L, 4, 2, 10, 6, Array(10.0, 10.0, 0.0, 9000.0, 0.0, -10.0), "EPSG:3857")
    assert(red.width == 10 && red.height == 6)
    assert(red.gt(0) == 10.0 + 4 * 10.0 && red.gt(3) == 9000.0 - 2 * 10.0)
    // the PLT prefix keeps the overview fetch under the whole file when
    // the file outgrows the header probe... at this fixture size the
    // probe covers it; assert the prefix accounting instead
    assert(Jpeg2000.prefixLenFor(bytes, 1).exists(_ < bytes.length),
      "level-1 prefix must be shorter than the file")
    // the reduced window's pixels equal the same region of a direct
    // reduced-resolution decode
    val direct = Jp2Raster.readAt(
      java.nio.file.Files.readAllBytes(f.toPath), 1)
    val db = java.nio.ByteBuffer.wrap(direct.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rb = java.nio.ByteBuffer.wrap(red.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 6; x <- 0 until 10)
      assert(rb.getDouble((y * 10 + x) * 8) ==
        db.getDouble(((y + 2) * 48 + (x + 4)) * 8), s"($x,$y)")
  }

  test("windowed decode ≡ full decode crop, across window positions and shapes") {
    val rnd = new scala.util.Random(27)
    for ((w, h, depth, levels, mct) <- Seq((130, 70, 8, 3, false),
        (97, 111, 16, 4, false), (64, 64, 8, 2, true))) {
      val nComp = if (mct) 3 else 1
      val planes = Seq.fill(nComp)(planeOf(w, h, depth, signed = false,
        (_, _) => rnd.nextInt(1 << depth)))
      val cs = Jpeg2000.encode(planes, levels = levels, cbExp = 4, mct = mct)
      val full = Jpeg2000.decode(cs)
      // corners, center, single pixel, full-extent, odd offsets
      val windows = Seq((0, 0, 7, 5), (w - 9, h - 6, 9, 6), (w / 3, h / 3, 11, 13),
        (w / 2, h / 2, 1, 1), (0, 0, w, h), (5, 7, w - 11, h - 14))
      for ((wx, wy, wwid, whgt) <- windows) {
        val win = Jpeg2000.decodeWindow(cs, wx, wy, wwid, whgt)
        assert(win.length == nComp)
        for (ci <- 0 until nComp; y <- 0 until whgt; x <- 0 until wwid)
          assert(win(ci).samples(y * wwid + x) ==
            full(ci).samples((wy + y) * w + (wx + x)),
            s"${w}x$h mct=$mct window ($wx,$wy,$wwid,$whgt) comp $ci at ($x,$y)")
      }
    }
    // out-of-bounds windows refuse
    val cs1 = Jpeg2000.encode(Seq(planeOf(16, 16, 8, signed = false, (x, y) => x + y)))
    intercept[IllegalArgumentException](Jpeg2000.decodeWindow(cs1, 10, 10, 10, 10))
  }

  test("out-db loader windowed read uses the selective decode and re-anchors geo") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val w = 96; val h = 64
    val vals = Array.tabulate(w * h)(i => ((i * 37) % 250).toDouble)
    val r = Raster("EPSG:3857", Array(100.0, 2.0, 0.0, 500.0, 0.0, -2.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_8BITS")))
    val bytes = Jp2Raster.write(r, levels = 3)
    val fetch = (off: Long, n: Int) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    val win = Jp2Raster.OutDb.loadWindow(fetch, bytes.length.toLong, 10, 20, 8, 6)
    assert(win.width == 8 && win.height == 6 && win.crs == "EPSG:3857")
    assert(win.gt(0) == 100.0 + 10 * 2.0 && win.gt(3) == 500.0 - 20 * 2.0)
    val bb = java.nio.ByteBuffer.wrap(win.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 6; x <- 0 until 8)
      assert(bb.getDouble((y * 8 + x) * 8) == vals((20 + y) * w + (10 + x)),
        s"($x,$y)")
  }

  test("corrupt and truncated inputs terminate with errors, never hang") {
    val p = planeOf(32, 24, 8, signed = false, (x, y) => (x * 7 + y * 3) % 256)
    val cs = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4)
    val rnd = new scala.util.Random(8)
    // truncations at every tenth byte: decode must throw or return fast
    var t = 4
    while (t < cs.length) {
      try Jpeg2000.decode(java.util.Arrays.copyOfRange(cs, 0, t))
      catch { case _: Exception => } // any loud failure is acceptable
      t += math.max(1, cs.length / 10)
    }
    // random byte corruption in the tile body (headers intact enough to
    // enter the packet parser) — 50 trials
    for (_ <- 0 until 50) {
      val m = cs.clone()
      val at = 60 + rnd.nextInt(m.length - 60)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      try Jpeg2000.decode(m)
      catch { case _: Exception => }
    }
    // pure junk with a valid SOC prefix
    val junk = Array[Byte](0xFF.toByte, 0x4F.toByte) ++
      Array.fill(500)(rnd.nextInt(256).toByte)
    intercept[Exception](Jpeg2000.decode(junk))
    // the same sweeps over a FEATURE-RICH stream — the r17 marker
    // surface (subsampling + POC + PPM + ROI + layers + precincts) has
    // its own parsers (packet sequencer, Nppm record walk, per-component
    // grids) that must also refuse or return, never hang
    val rich = Jpeg2000.encode(Seq(
        planeOf(48, 40, 8, signed = false, (x, y) => (x * 5 + y * 11) % 256),
        planeOf(24, 20, 8, signed = false, (x, y) => (x + y * 7) % 256)),
      levels = 2, cbExp = 4, layers = 2, precinct = Some((4, 4)),
      subsampling = Map(1 -> (2, 2)), packedHeaders = 1,
      poc = Seq((0, 0, 2, 1, 2, 0), (1, 0, 2, 3, 2, 2)),
      roi = Map(0 -> (8, 8, 16, 12)))
    var tr = 4
    while (tr < rich.length) {
      try Jpeg2000.decode(java.util.Arrays.copyOfRange(rich, 0, tr))
      catch { case _: Exception => }
      tr += math.max(1, rich.length / 25)
    }
    for (_ <- 0 until 80) {
      val m = rich.clone()
      val at = 2 + rnd.nextInt(m.length - 2) // headers included this time
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      try Jpeg2000.decode(m)
      catch { case _: Exception => }
    }
  }

  test("multi tile-part streams: truncation and corruption stay loud or exact") {
    val rnd = new scala.util.Random(55)
    val p = planeOf(96, 64, 8, signed = false, (_, _) => rnd.nextInt(256))
    val cs = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4,
      tileSize = Some((32, 32)), order = 1, partsPerResolution = true)
    val full = Jpeg2000.decode(cs)
    // truncations at every ~1/40 of the stream: throw or return fast,
    // and a REDUCED decode that does succeed on a prefix must be exact
    var t = 4
    while (t < cs.length) {
      val pre = java.util.Arrays.copyOfRange(cs, 0, t)
      try Jpeg2000.decode(pre)
      catch { case _: Exception => }
      try {
        val red = Jpeg2000.decode(pre, 2)
        samePlanes(red, Jpeg2000.decode(cs, 2), s"reduced-on-prefix t=$t")
      } catch { case _: Exception => }
      t += math.max(1, cs.length / 40)
    }
    // bit corruption across the whole multi-part stream
    for (_ <- 0 until 50) {
      val m = cs.clone()
      val at = 60 + rnd.nextInt(m.length - 60)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      try {
        val out = Jpeg2000.decode(m)
        // a decode that survives a TILE-BODY bit flip may differ in
        // samples (entropy payload) but must keep the geometry
        assert(out.head.w == 96 && out.head.h == 64)
      } catch { case _: Exception => }
    }
    assert(full.head.w == 96 && full.head.h == 64)
  }

  test("unsupported features fail loudly, never silently wrong") {
    val p = planeOf(8, 8, 8, signed = false, (x, y) => x + y)
    val cs = Jpeg2000.encode(Seq(p), levels = 1, cbExp = 4)
    // flip the transform byte in COD (offset: find 0xFF52 and poke
    // SPcod's last byte) from 1 (5/3) to 0 (9/7)
    val idx = cs.indices.dropRight(1).find(i =>
      (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x52).get
    val lcod = ((cs(idx + 2) & 0xFF) << 8) | (cs(idx + 3) & 0xFF)
    val mutated = cs.clone()
    mutated(idx + 2 + lcod - 1) = 0 // last SPcod byte = transform
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(mutated))
    assert(e.getMessage.contains("5/3"))
    // an unknown progression order (5 is reserved) must refuse
    val mutated2 = cs.clone()
    mutated2(idx + 5) = 5 // SGcod progression order byte
    val e2 = intercept[IllegalArgumentException](Jpeg2000.decode(mutated2))
    assert(e2.getMessage.contains("progression order"))
    // QCC overrides are now parsed per component (the RCT chroma path
    // writes them) — but a MALFORMED one carrying fewer exponents than
    // the COD levels need must refuse loudly, not decode wrong. Insert
    // it after the QCD (a QCC ahead of its QCD is a separate loud error).
    val qidx = cs.indices.dropRight(1).find(i =>
      (cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x5C).get
    val lqcd = ((cs(qidx + 2) & 0xFF) << 8) | (cs(qidx + 3) & 0xFF)
    val insertAt = qidx + 2 + lqcd
    val qcc = Array[Byte](0xFF.toByte, 0x5D.toByte, 0, 4, 0, 0x40)
    val withQcc = cs.take(insertAt) ++ qcc ++ cs.drop(insertAt)
    val e3 = intercept[IllegalArgumentException](Jpeg2000.decode(withQcc))
    assert(e3.getMessage.contains("exponents"), e3.getMessage)
    // and a QCC arriving before any QCD refuses too
    val early = cs.take(idx) ++ qcc ++ cs.drop(idx)
    val e4 = intercept[IllegalArgumentException](Jpeg2000.decode(early))
    assert(e4.getMessage.contains("QCC before QCD"), e4.getMessage)
  }

  // ---------------------------------------------------------------
  // Multi-tile codestreams (SOT per tile + TLM byte directory)
  // ---------------------------------------------------------------

  test("multi-tile roundtrip bit-exact: odd edge tiles, 16-bit RCT chroma (QCC)") {
    val rnd = new scala.util.Random(97)
    // 130x70 with 64x32 tiles -> 3x3 grid including a 2-wide and a
    // 6-tall edge tile; the 16-bit 3-component case exercises the RCT
    // chroma bit-depth expansion end to end (QCD for Y, QCC with +1
    // exponents for Cb/Cr — the worst-case input that used to trip the
    // encoder's magnitude require)
    for ((depth, nComp, mct) <- Seq((8, 1, false), (16, 3, true))) {
      val planes = Seq.fill(nComp)(planeOf(130, 70, depth, signed = false,
        (_, _) => rnd.nextInt(1 << depth)))
      val cs = Jpeg2000.encode(planes, levels = 5, cbExp = 4, mct = mct,
        tileSize = Some((64, 32)))
      val back = Jpeg2000.decode(cs)
      assert(back.length == nComp)
      planes.zip(back).zipWithIndex.foreach { case ((a, b), ci) =>
        assert(b.w == a.w && b.h == a.h, s"depth $depth comp $ci header")
        assert(java.util.Arrays.equals(a.samples, b.samples),
          s"depth $depth comp $ci: first diff at " +
            a.samples.zip(b.samples).indexWhere(q => q._1 != q._2))
      }
    }
    // a tile size not aligned to 2^levels refuses loudly (canvas parity)
    val e = intercept[IllegalArgumentException](Jpeg2000.encode(
      Seq(planeOf(64, 64, 8, signed = false, (x, y) => x + y)),
      levels = 3, tileSize = Some((20, 20))))
    assert(e.getMessage.contains("multiple"))
  }

  test("multi-tile windowed decode ≡ full crop, windows straddling tile seams") {
    val rnd = new scala.util.Random(98)
    val planes = Seq.fill(3)(planeOf(130, 70, 8, signed = false,
      (_, _) => rnd.nextInt(256)))
    val cs = Jpeg2000.encode(planes, levels = 4, cbExp = 4, mct = true,
      tileSize = Some((64, 32)))
    val full = Jpeg2000.decode(cs)
    // straddles 4 tiles; inside one tile; on the far edge; full extent
    val windows = Seq((60, 28, 12, 10), (10, 5, 7, 9), (126, 66, 4, 4),
      (0, 0, 130, 70), (63, 31, 2, 2))
    for ((wx, wy, ww, wh) <- windows) {
      val win = Jpeg2000.decodeWindow(cs, wx, wy, ww, wh)
      for (ci <- 0 until 3; y <- 0 until wh; x <- 0 until ww)
        assert(win(ci).samples(y * ww + x) ==
          full(ci).samples((wy + y) * 130 + (wx + x)),
          s"window ($wx,$wy,$ww,$wh) comp $ci at ($x,$y)")
    }
  }

  test("multi-tile reduced decode ≡ per-tile single-tile reduced assembly") {
    val rnd = new scala.util.Random(99)
    val w = 160; val h = 88 // tiles 64x32 -> edge tiles 32x24 (>= 2^3)
    val p = planeOf(w, h, 12, signed = false, (_, _) => rnd.nextInt(1 << 12))
    val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4,
      tileSize = Some((64, 32)))
    for (d <- 0 to 3) {
      val red = Jpeg2000.decode(cs, d)
      val rw = red.head.w; val rh = red.head.h
      assert(rw == Jp2Raster.Jpeg2000Dims.lowLen(w, d) && rh == Jp2Raster.Jpeg2000Dims.lowLen(h, d))
      // oracle: each tile is an independent codestream — encode the
      // tile region alone, reduce-decode it, and the mosaic must match
      for (ty <- 0 until 3; tx <- 0 until 3) {
        val tx0 = tx * 64; val ty0 = ty * 32
        val tcw = math.min(64, w - tx0); val tch = math.min(32, h - ty0)
        val tp = Plane(tcw, tch, 12, signed = false,
          Array.tabulate(tcw * tch)(i =>
            p.samples((ty0 + i / tcw) * w + (tx0 + i % tcw))))
        val solo = Jpeg2000.decode(
          Jpeg2000.encode(Seq(tp), levels = 3, cbExp = 4), d).head
        for (y <- 0 until solo.h; x <- 0 until solo.w)
          assert(red.head.samples(((ty0 >> d) + y) * rw + (tx0 >> d) + x) ==
            solo.samples(y * solo.w + x),
            s"d=$d tile ($tx,$ty) at ($x,$y)")
      }
      // reduced WINDOW (level coords) ≡ reduced full crop
      if (d > 0) {
        val (wx, wy, ww2, wh2) = (rw / 3, rh / 3, rw / 2, rh / 3)
        val winp = Jpeg2000.decodeWindowAt(cs, d, wx, wy, ww2, wh2)
        for (y <- 0 until wh2; x <- 0 until ww2)
          assert(winp.head.samples(y * ww2 + x) ==
            red.head.samples((wy + y) * rw + wx + x), s"d=$d at ($x,$y)")
      }
    }
  }

  test("TLM directory: ranges tile the stream; stitched partial stream decodes a window") {
    val rnd = new scala.util.Random(100)
    val planes = Seq.fill(1)(planeOf(130, 70, 8, signed = false,
      (_, _) => rnd.nextInt(256)))
    val cs = Jpeg2000.encode(planes, levels = 4, cbExp = 4,
      tileSize = Some((64, 32)))
    val hd = Jpeg2000.layout(cs)
    val ranges = Jpeg2000.tileRangesFromTlm(cs).get
    assert(ranges.length == 9 && ranges.forall(_.length == 1))
    assert(ranges.head.head._1 == hd.firstSot)
    // contiguous, each starting at an SOT with the right Isot, ending at EOC
    ranges.zipWithIndex.foreach { case (parts, i) =>
      val (off, len) = parts.head
      assert((cs(off.toInt) & 0xFF) == 0xFF && (cs(off.toInt + 1) & 0xFF) == 0x90, s"tile $i")
      val isot = ((cs(off.toInt + 4) & 0xFF) << 8) | (cs(off.toInt + 5) & 0xFF)
      assert(isot == i)
      if (i > 0) assert(off == ranges(i - 1).head._1 + ranges(i - 1).head._2)
    }
    assert(ranges.last.head._1 + ranges.last.head._2 == cs.length - 2)
    // stitch ONLY the tile an interior window needs (tile (1,1) = #4)
    val needed = Seq(4)
    val st = new java.io.ByteArrayOutputStream()
    st.write(cs, 0, hd.firstSot)
    needed.foreach { ti =>
      val (off, len) = ranges(ti).head
      st.write(cs, off.toInt, len)
    }
    st.write(0xFF); st.write(0xD9)
    val stitched = st.toByteArray
    assert(stitched.length < cs.length / 2, "stitching must skip bytes")
    val win = Jpeg2000.decodeWindow(stitched, 70, 40, 8, 6)
    val oracle = Jpeg2000.decodeWindow(cs, 70, 40, 8, 6)
    assert(java.util.Arrays.equals(win.head.samples, oracle.head.samples))
    // a window needing an ABSENT tile refuses loudly
    val e = intercept[IllegalArgumentException](
      Jpeg2000.decodeWindow(stitched, 120, 60, 8, 6))
    assert(e.getMessage.contains("missing"))
  }

  test("out-db tiled: window fetch is tile-ranged, overview fetch is per-tile prefixes") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val rnd = new scala.util.Random(101)
    val w = 1024; val h = 512 // incompressible 16-bit -> file >> 256KB probe
    val vals = Array.tabulate(w * h)(_ => rnd.nextInt(1 << 16).toDouble)
    val r = Raster("EPSG:32632", Array(500000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_16BITS")))
    val bytes = Jp2Raster.write(r, levels = 3, tileSize = Some((256, 128)))
    assert(bytes.length > 512 * 1024, s"fixture must outgrow the probe: ${bytes.length}")
    var fetched = 0L
    val fetch = (off: Long, n: Int) => {
      fetched += n
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    }
    // window inside one interior tile: header probe + ~1/16 of the body
    fetched = 0L
    val win = Jp2Raster.OutDb.loadWindow(fetch, bytes.length.toLong, 300, 150, 40, 20)
    assert(fetched < bytes.length / 2,
      s"window fetched $fetched of ${bytes.length}")
    val full = Jp2Raster.read(bytes)
    val fb = java.nio.ByteBuffer.wrap(full.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val wb = java.nio.ByteBuffer.wrap(win.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 20; x <- 0 until 40)
      assert(wb.getDouble((y * 40 + x) * 8) ==
        fb.getDouble(((150 + y) * w + 300 + x) * 8), s"($x,$y)")
    assert(win.gt(0) == 500000.0 + 300 * 10.0 && win.gt(3) == 5000000.0 - 150 * 10.0)
    // overview window at level 2: per-tile PLT prefixes, not the scene
    fetched = 0L
    val red = Jp2Raster.OutDb.loadWindowAt(fetch, bytes.length.toLong,
      2L, 10, 20, 100, 60, Array(500000.0, 40.0, 0.0, 5000000.0, 0.0, -40.0),
      "EPSG:32632")
    assert(fetched < bytes.length / 2,
      s"overview fetched $fetched of ${bytes.length}")
    assert(red.width == 100 && red.height == 60)
    val direct = Jp2Raster.readAt(bytes, 2)
    val db = java.nio.ByteBuffer.wrap(direct.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rb = java.nio.ByteBuffer.wrap(red.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 60; x <- 0 until 100)
      assert(rb.getDouble((y * 100 + x) * 8) ==
        db.getDouble(((20 + y) * 256 + 10 + x) * 8), s"red ($x,$y)")
    assert(red.gt(0) == 500000.0 + 10 * 40.0 && red.gt(3) == 5000000.0 - 20 * 40.0)
  }

  test("out-db tiled, kakadu profile: RPCL+precincts+layers keep ranged fetches") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val rnd = new scala.util.Random(212)
    val w = 1024; val h = 512
    val vals = Array.tabulate(w * h)(_ => rnd.nextInt(1 << 16).toDouble)
    val r = Raster("EPSG:32632", Array(500000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_16BITS")))
    // the Sentinel-2-style packaging: tiled + RPCL + precincts + layers
    // + SOP/EPH. RPCL is resolution-major, so per-tile PLT prefixes
    // still bound overview fetches.
    val bytes = Jp2Raster.write(r, levels = 3, tileSize = Some((256, 128)),
      layers = 3, order = 2, precinct = Some((6, 6)), sopEph = true)
    assert(bytes.length > 512 * 1024)
    var fetched = 0L
    val fetch = (off: Long, n: Int) => {
      fetched += n
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    }
    val full = Jp2Raster.read(bytes)
    val fb = java.nio.ByteBuffer.wrap(full.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // full-res window: tile-ranged fetch through the profile stream
    fetched = 0L
    val win = Jp2Raster.OutDb.loadWindow(fetch, bytes.length.toLong, 300, 150, 40, 20)
    assert(fetched < bytes.length / 2,
      s"window fetched $fetched of ${bytes.length}")
    val wb = java.nio.ByteBuffer.wrap(win.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 20; x <- 0 until 40)
      assert(wb.getDouble((y * 40 + x) * 8) ==
        fb.getDouble(((150 + y) * w + 300 + x) * 8), s"($x,$y)")
    // overview at level 2: per-tile prefixes must stay bounded even
    // with 3 layers x precinct packets per resolution
    fetched = 0L
    val red = Jp2Raster.OutDb.loadWindowAt(fetch, bytes.length.toLong,
      2L, 10, 20, 100, 60, Array(500000.0, 40.0, 0.0, 5000000.0, 0.0, -40.0),
      "EPSG:32632")
    assert(fetched < bytes.length / 2,
      s"overview fetched $fetched of ${bytes.length}")
    val direct = Jp2Raster.readAt(bytes, 2)
    val db = java.nio.ByteBuffer.wrap(direct.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rb = java.nio.ByteBuffer.wrap(red.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 60; x <- 0 until 100)
      assert(rb.getDouble((y * 100 + x) * 8) ==
        db.getDouble(((20 + y) * 256 + 10 + x) * 8), s"red ($x,$y)")
  }

  test("out-db multi tile-parts: overview fetches only each tile's leading parts") {
    import graft.functions.RasterModel
    import graft.functions.RasterModel.{Band, Raster}
    val rnd = new scala.util.Random(333)
    val w = 1024; val h = 512
    val vals = Array.tabulate(w * h)(_ => rnd.nextInt(1 << 16).toDouble)
    val r = Raster("EPSG:32632", Array(500000.0, 10.0, 0.0, 5000000.0, 0.0, -10.0),
      w, h, Vector(Band(Double.NaN, RasterModel.packDoubles(vals),
        ptype = "UNSIGNED_16BITS")))
    // the real Sentinel-2 packaging: tiled + RPCL + one tile-part per
    // resolution (TLM ST=2 directory)
    val bytes = Jp2Raster.write(r, levels = 3, tileSize = Some((256, 128)),
      order = 2, partsPerResolution = true)
    assert(bytes.length > 512 * 1024)
    var fetched = 0L
    val fetch = (off: Long, n: Int) => {
      fetched += n
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    }
    val full = Jp2Raster.read(bytes)
    val fb = java.nio.ByteBuffer.wrap(full.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // full-res window: all parts of one tile
    fetched = 0L
    val win = Jp2Raster.OutDb.loadWindow(fetch, bytes.length.toLong, 300, 150, 40, 20)
    assert(fetched < bytes.length / 2, s"window fetched $fetched of ${bytes.length}")
    val wb = java.nio.ByteBuffer.wrap(win.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 20; x <- 0 until 40)
      assert(wb.getDouble((y * 40 + x) * 8) ==
        fb.getDouble(((150 + y) * w + 300 + x) * 8), s"($x,$y)")
    // level-2 overview: per tile only parts r0+r1 (plus the boundary
    // peek) — on incompressible data that is ~1/16 of the body, far
    // under the single-part prefix of the same stream
    fetched = 0L
    val red = Jp2Raster.OutDb.loadWindowAt(fetch, bytes.length.toLong,
      2L, 10, 20, 100, 60, Array(500000.0, 40.0, 0.0, 5000000.0, 0.0, -40.0),
      "EPSG:32632")
    // beyond the fixed 256KB header probe, the part fetches must stay a
    // small fraction of the body (r0+r1 of incompressible data ~ 1/16)
    assert(fetched - 256 * 1024 < bytes.length / 8,
      s"overview fetched $fetched of ${bytes.length}")
    val direct = Jp2Raster.readAt(bytes, 2)
    val db = java.nio.ByteBuffer.wrap(direct.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rb = java.nio.ByteBuffer.wrap(red.bands.head.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (y <- 0 until 60; x <- 0 until 100)
      assert(rb.getDouble((y * 100 + x) * 8) ==
        db.getDouble(((20 + y) * 256 + 10 + x) * 8), s"red ($x,$y)")
    assert(red.gt(0) == 500000.0 + 10 * 40.0 && red.gt(3) == 5000000.0 - 20 * 40.0)
  }

  // ---------------------------------------------------------------
  // Lossy 9/7 path (irreversible DWT + scalar quantization)
  // ---------------------------------------------------------------

  test("9/7 lifting roundtrips every length 1..40 within float tolerance") {
    val rnd = new scala.util.Random(7)
    for (n <- 1 to 40; trial <- 0 until 3) {
      val x = Array.fill(n)(rnd.nextDouble() * 512 - 256)
      val (s, dd) = Jpeg2000.fwd97(x)
      assert(s.length == (n + 1) / 2 && dd.length == n / 2)
      val back = Jpeg2000.inv97(s, dd)
      for (i <- 0 until n)
        assert(math.abs(back(i) - x(i)) < 1e-9, s"n=$n trial=$trial i=$i")
    }
    // a linear ramp lands entirely in the low band away from the seams
    // (vanishing moment: (1+2a) + 2g(1+2b(1+2a)) = 0); the symmetric
    // extension breaks the ramp at both edges, and the edge d-value
    // contaminates its neighbour THROUGH the beta-updated s — so the
    // zero region is d(1)..d(nd-3)
    val (_, dRamp) = Jpeg2000.fwd97(Array.tabulate(64)(i => 3.0 * i))
    assert(dRamp.drop(1).dropRight(2).forall(v => math.abs(v) < 1e-9),
      dRamp.toSeq.take(8) ++ dRamp.toSeq.takeRight(4))
  }

  test("quantizer signalling: (eps, mu) reconstructs the step; dequant-requant is identity") {
    for (rb <- Seq(8, 10, 18); dIn <- Seq(0.25, 0.5, 1.0, 1.7, 2.0, 13.37, 255.0)) {
      val (e, m) = Jpeg2000.stepToEpsMu(dIn, rb)
      assert(e >= 0 && e <= 31 && m >= 0 && m <= 2047, s"($e,$m)")
      val dHat = Jpeg2000.stepOf(e, m, rb)
      assert(math.abs(dHat - dIn) / dIn < 1.0 / 2048 + 1e-6,
        s"rb=$rb delta=$dIn -> $dHat")
      // midpoint dequantization inverts exactly back to the index
      for (q <- Seq(0, 1, 2, 5, 1000, 123456)) {
        val v = (q + 0.5) * dHat
        assert(math.floor(v / dHat).toInt == q, s"q=$q dHat=$dHat")
      }
    }
  }

  test("lossy roundtrip: error bounded by the step, PSNR scales with qstep") {
    val rnd = new scala.util.Random(55)
    val w = 96; val h = 80
    // smooth terrain + noise: representative content
    val p = planeOf(w, h, 8, signed = false, (x, y) =>
      math.max(0, math.min(255,
        (96 + 64 * math.sin(x / 9.0) + 48 * math.cos(y / 7.0)).toInt + rnd.nextInt(17))))
    def mse(a: Array[Int], b: Array[Int]): Double =
      a.zip(b).map { case (u, v) => val e = (u - v).toDouble; e * e }.sum / a.length
    def maxErr(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (u, v) => math.abs(u - v) }.max
    var lastBytes = Int.MaxValue
    var lastMse = 0.0
    for (qstep <- Seq(0.51, 2.0, 8.0)) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5, qstep = qstep)
      val back = Jpeg2000.decode(cs).head
      assert(back.w == w && back.h == h && back.depth == 8)
      val me = maxErr(p.samples, back.samples)
      val ms = mse(p.samples, back.samples)
      info(f"qstep=$qstep%.2f bytes=${cs.length} maxErr=$me mse=$ms%.3f " +
        f"psnr=${10 * math.log10(255.0 * 255.0 / math.max(ms, 1e-12))}%.1f dB")
      assert(me <= math.max(2, (8 * qstep).toInt), s"qstep=$qstep maxErr=$me")
      assert(cs.length < lastBytes, "bigger step must not grow the stream")
      assert(ms >= lastMse, "bigger step must not reduce distortion")
      lastBytes = cs.length
      lastMse = ms
    }
  }

  test("lossy ICT 3-band roundtrip within tolerance; COD declares 9/7 + style-2 QCD") {
    val rnd = new scala.util.Random(56)
    val planes = Seq.fill(3)(planeOf(64, 48, 8, signed = false,
      (x, y) => math.min(255, x * 2 + y + rnd.nextInt(9))))
    val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 4, mct = true, qstep = 1.0)
    val back = Jpeg2000.decode(cs)
    for (ci <- 0 until 3) {
      val me = planes(ci).samples.zip(back(ci).samples)
        .map { case (u, v) => math.abs(u - v) }.max
      assert(me <= 12, s"comp $ci maxErr=$me")
    }
    // header honesty: transform byte 0 (9/7), Sqcd style 2
    val hd = Jpeg2000.layout(cs)
    assert(hd.transform == 0 && hd.qStyle == 2 && hd.mct == 1)
  }

  test("lossy multi-tile: per-tile independence, seam windows, reduced decode") {
    val rnd = new scala.util.Random(57)
    val w = 160; val h = 88
    val p = planeOf(w, h, 10, signed = false, (x, y) =>
      ((x * 13 + y * 29 + rnd.nextInt(25)) % 1024))
    val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4,
      tileSize = Some((64, 32)), qstep = 2.0)
    val full = Jpeg2000.decode(cs).head
    // per-tile oracle: each tile is independently coded, so a solo
    // encode/decode of the tile region reproduces the mosaic EXACTLY
    for (ty <- 0 until 3; tx <- 0 until 3) {
      val tx0 = tx * 64; val ty0 = ty * 32
      val tcw = math.min(64, w - tx0); val tch = math.min(32, h - ty0)
      val tp = Jpeg2000.Plane(tcw, tch, 10, signed = false,
        Array.tabulate(tcw * tch)(i =>
          p.samples((ty0 + i / tcw) * w + (tx0 + i % tcw))))
      val solo = Jpeg2000.decode(
        Jpeg2000.encode(Seq(tp), levels = 3, cbExp = 4, qstep = 2.0)).head
      for (y <- 0 until tch; x <- 0 until tcw)
        assert(full.samples((ty0 + y) * w + tx0 + x) == solo.samples(y * tcw + x),
          s"tile ($tx,$ty) at ($x,$y)")
    }
    // seam-straddling window ≡ full crop (exact: the window decode sees
    // the same decoded coefficients, and the lifting is local)
    val win = Jpeg2000.decodeWindow(cs, 60, 28, 12, 10)
    for (y <- 0 until 10; x <- 0 until 12)
      assert(win.head.samples(y * 12 + x) == full.samples((28 + y) * w + 60 + x),
        s"window at ($x,$y)")
    // reduced decode: right dims and a sane overview (LL of a 9/7)
    val red = Jpeg2000.decode(cs, 2)
    assert(red.head.w == Jp2Raster.Jpeg2000Dims.lowLen(w, 2) &&
      red.head.h == Jp2Raster.Jpeg2000Dims.lowLen(h, 2))
  }

  // ---------------------------------------------------------------
  // Progression orders, quality layers, precincts, SOP/EPH (B.12)
  // — the packet-PACKAGING features real encoders (Kakadu/openjpeg
  // Sentinel-2 profiles) use. Core invariant: packaging must not
  // change ANY decode output, so every combination is differentially
  // pinned against the plain LRCP/1-layer/no-precinct stream.
  // ---------------------------------------------------------------

  private def samePlanes(a: Seq[Plane], b: Seq[Plane], tag: String): Unit = {
    assert(a.length == b.length, tag)
    a.zip(b).zipWithIndex.foreach { case ((x, y), ci) =>
      assert(x.w == y.w && x.h == y.h && x.depth == y.depth &&
        x.signed == y.signed, s"$tag comp $ci header")
      assert(java.util.Arrays.equals(x.samples, y.samples),
        s"$tag comp $ci: first diff at " +
          x.samples.zip(y.samples).indexWhere(p => p._1 != p._2))
    }
  }

  test("progression orders: all five roundtrip bit-exact, 1 and 3 layers") {
    val rnd = new scala.util.Random(140814)
    val planes = Seq.tabulate(3)(c =>
      planeOf(70, 50, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val plain = Jpeg2000.decode(
      Jpeg2000.encode(planes, levels = 2, cbExp = 4, mct = true))
    for (order <- 0 to 4; layers <- Seq(1, 3)) {
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4, mct = true,
        layers = layers, order = order)
      samePlanes(Jpeg2000.decode(cs), plain, s"order=$order layers=$layers")
      // packaging-independence extends to reduced decodes and windows
      samePlanes(Jpeg2000.decode(cs, 1),
        Jpeg2000.decode(Jpeg2000.encode(planes, levels = 2, cbExp = 4,
          mct = true), 1), s"order=$order layers=$layers reduced")
    }
  }

  test("quality layers: many layers, more layers than passes, deep splits") {
    val rnd = new scala.util.Random(7341)
    // noisy content (many passes per block) and near-flat content
    // (np < layers — some layers carry no contribution at all)
    val noisy = planeOf(64, 64, 12, signed = false, (_, _) => rnd.nextInt(4096))
    val flat = planeOf(64, 64, 12, signed = false, (x, y) => 2048 + (x + y) % 2)
    for (p <- Seq(noisy, flat); layers <- Seq(2, 5, 17)) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5, layers = layers)
      samePlanes(Jpeg2000.decode(cs),
        Jpeg2000.decode(Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5)),
        s"layers=$layers")
    }
  }

  test("precincts: sizes down to 1x1 band cells, odd edges, cb capping") {
    val rnd = new scala.util.Random(90125)
    for {
      (w, h) <- Seq((33, 17), (64, 64), (9, 7))
      (px, py) <- Seq((1, 1), (2, 3), (4, 4), (6, 5))
    } {
      val p = planeOf(w, h, 8, signed = false, (_, _) => rnd.nextInt(256))
      val plain = Jpeg2000.decode(Jpeg2000.encode(Seq(p), levels = 2, cbExp = 6))
      // cbExp 6 (64) is far above small precincts: the effective
      // code-block dims must be CAPPED to the precinct partition (B.7)
      val cs = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 6,
        precinct = Some((px, py)))
      samePlanes(Jpeg2000.decode(cs), plain, s"${w}x$h pp=($px,$py)")
      // windows must see identical pixels through precinct packets
      if (w >= 20) {
        val win = Jpeg2000.decodeWindow(cs, 5, 3, 11, 9)
        for (y <- 0 until 9; x <- 0 until 11)
          assert(win.head.samples(y * 11 + x) ==
            plain.head.samples((3 + y) * w + 5 + x),
            s"window ($x,$y) pp=($px,$py)")
      }
    }
  }

  test("SOP/EPH resync markers roundtrip; missing EPH refuses loudly") {
    val rnd = new scala.util.Random(60901)
    val p = planeOf(48, 40, 8, signed = false, (_, _) => rnd.nextInt(256))
    val plain = Jpeg2000.decode(Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4))
    val cs = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4, sopEph = true,
      layers = 2, precinct = Some((4, 4)))
    samePlanes(Jpeg2000.decode(cs), plain, "sop/eph")
    // a stream CLAIMING EPH without writing it must refuse, not drift
    val noEph = Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4)
    val idx = noEph.indices.dropRight(1).find(i =>
      (noEph(i) & 0xFF) == 0xFF && (noEph(i + 1) & 0xFF) == 0x52).get
    val mutated = noEph.clone()
    mutated(idx + 4) = 4 // Scod: EPH flag
    val e = intercept[Exception](Jpeg2000.decode(mutated))
    assert(e.getMessage.contains("EPH"))
  }

  test("kakadu-style profile: RPCL + precincts + SOP/EPH + layers + tiles") {
    val rnd = new scala.util.Random(20260815)
    val w = 150; val h = 100
    val planes = Seq.tabulate(3)(c => planeOf(w, h, 12, signed = false,
      (x, y) => (x * 7 + y * 31 + c * 911 + rnd.nextInt(64)) % 4096))
    def enc(tiles: Option[(Int, Int)]) =
      Jpeg2000.encode(planes, levels = 3, cbExp = 5, mct = true,
        tileSize = tiles, layers = 3, order = 2,
        precinct = Some((5, 5)), sopEph = true)
    val plain = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 3,
      cbExp = 5, mct = true))
    for (tiles <- Seq(None, Some((64, 64)))) {
      val cs = enc(tiles)
      samePlanes(Jpeg2000.decode(cs), plain, s"profile tiles=$tiles")
      // seam-straddling window through the full feature stack
      val win = Jpeg2000.decodeWindow(cs, 60, 60, 10, 8)
      for (ci <- planes.indices; y <- 0 until 8; x <- 0 until 10)
        assert(win(ci).samples(y * 10 + x) ==
          plain(ci).samples((60 + y) * w + 60 + x),
          s"window ($x,$y) comp $ci tiles=$tiles")
      // reduced decode ≡ the plain stream's WITH THE SAME TILING
      // (identical coefficients, different packaging; the reduced LL is
      // tiling-dependent near seams, so the oracle must share the grid)
      for (d <- 1 to 3)
        samePlanes(Jpeg2000.decode(cs, d),
          Jpeg2000.decode(Jpeg2000.encode(planes, levels = 3, cbExp = 5,
            mct = true, tileSize = tiles), d), s"reduced d=$d tiles=$tiles")
    }
  }

  test("prefix reads honor the progression order's resolution-majority") {
    val rnd = new scala.util.Random(31337)
    val p = planeOf(120, 90, 8, signed = false, (_, _) => rnd.nextInt(256))
    // RLCP(1)/RPCL(2) are resolution-major at any layer count: a PLT
    // prefix suffices for a reduced decode even with layers + precincts
    for (order <- Seq(1, 2); layers <- Seq(1, 3)) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4,
        layers = layers, order = order, precinct = Some((5, 5)))
      for (d <- 1 to 3) {
        val n = Jpeg2000.prefixLenFor(cs, d).get
        assert(n < cs.length, s"order=$order layers=$layers d=$d")
        val fromPrefix =
          Jpeg2000.decode(java.util.Arrays.copyOfRange(cs, 0, n), d)
        samePlanes(fromPrefix, Jpeg2000.decode(cs, d),
          s"order=$order layers=$layers d=$d")
      }
    }
    // LRCP with layers > 1, PCRL, CPRL interleave resolutions: no
    // prefix is sufficient and the loader must fall back to full fetch
    for ((order, layers) <- Seq((0, 2), (3, 1), (4, 1))) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4,
        layers = layers, order = order)
      assert(Jpeg2000.prefixLenFor(cs, 1).isEmpty,
        s"order=$order layers=$layers must not claim a prefix")
      // ... but the FULL stream still decodes reduced correctly
      samePlanes(Jpeg2000.decode(cs, 2),
        Jpeg2000.decode(Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4), 2),
        s"order=$order layers=$layers full-fetch reduced")
    }
  }

  test("lossy composes with orders, layers, precincts: identical output") {
    val rnd = new scala.util.Random(8086)
    val p = planeOf(72, 56, 10, signed = false,
      (x, y) => (x * 13 + y * 29 + rnd.nextInt(25)) % 1024)
    // quantized indices are packaging-independent: every combination
    // reconstructs EXACTLY the plain lossy stream's pixels
    val plain = Jpeg2000.decode(
      Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4, qstep = 2.0))
    for ((order, layers, prec) <- Seq((2, 3, Some((4, 4))),
        (4, 2, Some((3, 5))), (1, 5, None))) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 4, qstep = 2.0,
        order = order, layers = layers, precinct = prec, sopEph = true)
      samePlanes(Jpeg2000.decode(cs), plain,
        s"lossy order=$order layers=$layers prec=$prec")
    }
  }

  test("multi tile-parts: per-resolution parts decode bit-exact, all paths") {
    val rnd = new scala.util.Random(140)
    // multi-tile 16-bit + 3-band RCT 8-bit, lossless and lossy, RLCP and
    // RPCL: the per-resolution tile-part packaging must never change a
    // single output sample vs the single-part stream
    val p16 = Seq(planeOf(130, 70, 16, signed = false, (_, _) => rnd.nextInt(60000)))
    val rgb = Seq.fill(3)(planeOf(96, 64, 8, signed = false, (_, _) => rnd.nextInt(256)))
    for ((planes, mct, tiles, tag) <- Seq(
      (p16, false, Some((64, 32)), "16b tiled"),
      (p16, false, None, "16b single-tile"),
      (rgb, true, Some((32, 32)), "rgb tiled"))) {
      for ((order, qstep) <- Seq((1, 0.0), (2, 0.0), (1, 1.0 / 512))) {
        val single = Jpeg2000.encode(planes, levels = 3, cbExp = 4, mct = mct,
          tileSize = tiles, qstep = qstep, order = order)
        val multi = Jpeg2000.encode(planes, levels = 3, cbExp = 4, mct = mct,
          tileSize = tiles, qstep = qstep, order = order,
          partsPerResolution = true)
        // every tile now carries levels+1 parts, TPsot 0.., TNsot = 4
        val hd = Jpeg2000.layout(multi)
        val ranges = Jpeg2000.tileRangesFromTlm(multi).get
        assert(ranges.forall(_.length == 4), s"$tag o$order q$qstep parts")
        samePlanes(Jpeg2000.decode(multi), Jpeg2000.decode(single),
          s"$tag o$order q$qstep full")
        samePlanes(Jpeg2000.decode(multi, 2), Jpeg2000.decode(single, 2),
          s"$tag o$order q$qstep reduced")
        samePlanes(Jpeg2000.decodeWindow(multi, 21, 17, 40, 30),
          Jpeg2000.decodeWindow(single, 21, 17, 40, 30),
          s"$tag o$order q$qstep window")
        assert(hd.firstSot > 0)
      }
    }
    // per-resolution parts demand a resolution-major order
    val e = intercept[IllegalArgumentException](Jpeg2000.encode(p16,
      levels = 3, order = 0, partsPerResolution = true))
    assert(e.getMessage.contains("resolution-major"))
  }

  test("multi tile-parts: TLM ST=2 ranges tile the stream; prefix parts decode reduced") {
    val rnd = new scala.util.Random(141)
    val planes = Seq(planeOf(130, 70, 8, signed = false, (_, _) => rnd.nextInt(256)))
    val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 4,
      tileSize = Some((64, 32)), order = 1, partsPerResolution = true)
    val hd = Jpeg2000.layout(cs)
    val ranges = Jpeg2000.tileRangesFromTlm(cs).get
    assert(ranges.length == 9 && ranges.forall(_.length == 4))
    // parts are contiguous in stream order and each starts at an SOT
    // with the right Isot/TPsot
    var off = hd.firstSot.toLong
    for (ti <- 0 until 9; tp <- 0 until 4) {
      val (o, l) = ranges(ti)(tp)
      assert(o == off, s"tile $ti part $tp offset")
      assert((cs(o.toInt) & 0xFF) == 0xFF && (cs(o.toInt + 1) & 0xFF) == 0x90)
      val isot = ((cs(o.toInt + 4) & 0xFF) << 8) | (cs(o.toInt + 5) & 0xFF)
      assert(isot == ti && (cs(o.toInt + 10) & 0xFF) == tp)
      off += l
    }
    assert(off == cs.length - 2)
    // a stream holding only each tile's FIRST 2 parts (resolutions 0-1)
    // decodes at discard >= 2 bit-exactly
    val st = new java.io.ByteArrayOutputStream()
    st.write(cs, 0, hd.firstSot)
    for (ti <- 0 until 9; tp <- 0 until 2) {
      val (o, l) = ranges(ti)(tp)
      st.write(cs, o.toInt, l)
    }
    st.write(0xFF); st.write(0xD9)
    val prefix = st.toByteArray
    assert(prefix.length < cs.length / 2)
    samePlanes(Jpeg2000.decode(prefix, 2), Jpeg2000.decode(cs, 2), "prefix d2")
    samePlanes(Jpeg2000.decode(prefix, 3), Jpeg2000.decode(cs, 3), "prefix d3")
    // out-of-order tile-parts refuse loudly: swap a tile's parts 0 and 1
    val swapped = new java.io.ByteArrayOutputStream()
    swapped.write(cs, 0, hd.firstSot)
    val (o1, l1) = ranges(0)(1)
    val (o0, l0) = ranges(0)(0)
    swapped.write(cs, o1.toInt, l1)
    swapped.write(cs, o0.toInt, l0)
    swapped.write(0xFF); swapped.write(0xD9)
    val e = intercept[IllegalArgumentException](
      Jpeg2000.decode(swapped.toByteArray))
    assert(e.getMessage.contains("out of order"))
  }
  // ---------------------------------------------------------------
  // Scalar DERIVED quantization (QCD style 1) + COC overrides
  // ---------------------------------------------------------------

  test("derived quantization (style 1): bounded error, one-word QCD, style bit set") {
    val rnd = new scala.util.Random(57)
    val w = 90; val h = 70
    val p = planeOf(w, h, 8, signed = false, (x, y) =>
      math.max(0, math.min(255,
        (120 + 70 * math.sin(x / 8.0) + 40 * math.cos(y / 6.0)).toInt + rnd.nextInt(9))))
    for (qstep <- Seq(0.51, 2.0)) {
      val cs = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5, qstep = qstep,
        derivedQuant = true)
      // the QCD is the single-word form with style bits = 1
      var i = 0
      var found = false
      while (i + 4 < cs.length && !found) {
        if ((cs(i) & 0xFF) == 0xFF && (cs(i + 1) & 0xFF) == 0x5C) {
          val lqcd = ((cs(i + 2) & 0xFF) << 8) | (cs(i + 3) & 0xFF)
          assert(lqcd == 5, s"derived QCD must be one word, Lqcd=$lqcd")
          assert((cs(i + 4) & 0x1F) == 1, "Sqcd style bits must be 1 (derived)")
          found = true
        }
        i += 1
      }
      assert(found, "no QCD marker")
      val back = Jpeg2000.decode(cs).head
      // derived steps grow 2x per resolution (eps_b = eps0 + 1 - r), so
      // the top band quantizes ~2^(nl-1) coarser than the LL's qstep
      val me = p.samples.zip(back.samples).map { case (u, v) => math.abs(u - v) }.max
      assert(me <= math.max(2, (8 * qstep * 4).toInt), s"qstep=$qstep maxErr=$me")
    }
    // composes with the expounded path: same image, style 2, must differ
    // in signalling but both decode
    val csE = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5, qstep = 2.0)
    val csD = Jpeg2000.encode(Seq(p), levels = 3, cbExp = 5, qstep = 2.0,
      derivedQuant = true)
    assert(csD.length < csE.length, "derived QCD signalling must be smaller")
    assert(Jpeg2000.decode(csE).head.samples.length ==
      Jpeg2000.decode(csD).head.samples.length)
  }

  test("COC overrides: per-component code-block + precinct grids, lossless bit-exact") {
    val rnd = new scala.util.Random(58)
    val w = 75; val h = 52
    val planes = (0 until 3).map { c =>
      planeOf(w, h, 8, signed = false, (x, y) =>
        (x * (c + 3) + y * 5 + rnd.nextInt(64)) & 0xFF)
    }
    // comp 1: smaller code-blocks; comp 2: its own (finer) precincts —
    // per-component band grids AND packet sequences
    for (order <- Seq(0, 1, 2, 4); layers <- Seq(1, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 6,
        precinct = Some((6, 5)), order = order, layers = layers,
        cocCbExp = Map(1 -> 4), cocPrecinct = Map(2 -> (4, 4)))
      val back = Jpeg2000.decode(cs)
      assert(back.length == 3)
      for (c <- 0 until 3)
        assert(back(c).samples.toSeq == planes(c).samples.toSeq,
          s"order=$order layers=$layers comp=$c")
    }
    // identical result with and without the COC overrides (the override
    // changes the packet partitioning, never the samples)
    val plain = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 3, cbExp = 6))
    val withCoc = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 3, cbExp = 6,
      cocCbExp = Map(0 -> 3, 2 -> 5)))
    for (c <- 0 until 3)
      assert(plain(c).samples.toSeq == withCoc(c).samples.toSeq)
  }

  test("COC level overrides: per-component pyramid depths, lossless bit-exact") {
    val rnd = new scala.util.Random(61)
    val w = 83; val h = 57
    val planes = (0 until 3).map { c =>
      planeOf(w, h, 8, signed = false, (x, y) =>
        (x * (c + 2) + y * 3 + rnd.nextInt(64)) & 0xFF)
    }
    // comp 1 gets a 2-level pyramid, comp 2 a 3-level one, under a
    // 4-level COD — per-component resolution counts in the packet walk,
    // band grids, and inverse DWT
    for (order <- Seq(0, 1, 2, 4); layers <- Seq(1, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 4, cbExp = 5,
        order = order, layers = layers,
        cocLevels = Map(1 -> 2, 2 -> 3))
      val back = Jpeg2000.decode(cs)
      for (c <- 0 until 3)
        assert(back(c).samples.toSeq == planes(c).samples.toSeq,
          s"order=$order layers=$layers comp=$c")
    }
    // level overrides compose with per-component code-blocks + precincts
    val cs2 = Jpeg2000.encode(planes, levels = 4, cbExp = 6,
      precinct = Some((6, 5)), order = 1,
      cocLevels = Map(0 -> 1), cocCbExp = Map(1 -> 4),
      cocPrecinct = Map(2 -> (4, 4)))
    val back2 = Jpeg2000.decode(cs2)
    for (c <- 0 until 3)
      assert(back2(c).samples.toSeq == planes(c).samples.toSeq, s"comp=$c")
    // reduced decode is bounded by the SHALLOWEST pyramid: d = 1 works
    // (every component reaches scale 1/2), d = 2 refuses loudly
    val red = Jpeg2000.decode(cs2, 1)
    assert(red.head.w == (w + 1) / 2 && red.head.h == (h + 1) / 2)
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(cs2, 2))
    assert(e.getMessage.contains("discard"), e.getMessage)
    // identical samples with and without the overrides
    val plain = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 4, cbExp = 5))
    val withNl = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 4, cbExp = 5,
      cocLevels = Map(1 -> 0, 2 -> 2)))
    for (c <- 0 until 3)
      assert(plain(c).samples.toSeq == withNl(c).samples.toSeq)
  }

  test("COC transform overrides: mixed 9/7 lossy × 5/3 reversible components") {
    val rnd = new scala.util.Random(62)
    val w = 66; val h = 49
    val planes = (0 until 3).map { c =>
      planeOf(w, h, 8, signed = false, (x, y) =>
        (x + y * (c + 2) + rnd.nextInt(32)) & 0xFF)
    }
    // comp 1 stays REVERSIBLE 5/3 (e.g. a classification-mask band)
    // inside a lossy 9/7 stream: it must decode BIT-EXACT while the 9/7
    // components carry the quantizer's bounded error; the 5/3 component
    // is signalled via COC transform=1 + a style-0 QCC
    for (order <- Seq(0, 1, 2); layers <- Seq(1, 3)) {
      val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 5, qstep = 1.0,
        order = order, layers = layers, cocTransform = Map(1 -> 1))
      val back = Jpeg2000.decode(cs)
      assert(back(1).samples.toSeq == planes(1).samples.toSeq,
        s"order=$order layers=$layers: reversible component not exact")
      for (c <- Seq(0, 2)) {
        val me = planes(c).samples.zip(back(c).samples)
          .map { case (u, v) => math.abs(u - v) }.max
        assert(me <= 8, s"order=$order comp=$c maxErr=$me")
      }
    }
    // the full mix: per-component transform AND levels AND precincts —
    // the shape the reference reaches through GDAL's openjpeg
    // (rust/sedona-raster-gdal/src/register.rs:23-34)
    val cs2 = Jpeg2000.encode(planes, levels = 3, cbExp = 5, qstep = 0.5,
      precinct = Some((5, 5)), order = 2,
      cocTransform = Map(1 -> 1), cocLevels = Map(1 -> 2, 2 -> 1))
    val back2 = Jpeg2000.decode(cs2)
    assert(back2(1).samples.toSeq == planes(1).samples.toSeq)
    for (c <- Seq(0, 2)) {
      val me = planes(c).samples.zip(back2(c).samples)
        .map { case (u, v) => math.abs(u - v) }.max
      assert(me <= 4, s"comp=$c maxErr=$me")
    }
    // reduced decode of the mixed stream (d = 1 <= min levels)
    val red = Jpeg2000.decode(cs2, 1)
    assert(red.length == 3 && red.head.w == w / 2 && red.head.h == (h + 1) / 2)
    // a 9/7 override without a quantizer step refuses loudly
    val e = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes, levels = 3, cocTransform = Map(0 -> 0)))
    assert(e.getMessage.contains("qstep"), e.getMessage)
    // MCT couples components through one transform: refuse the mix
    val e2 = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes, levels = 3, qstep = 1.0, mct = true,
      cocTransform = Map(1 -> 1)))
    assert(e2.getMessage.contains("MCT"), e2.getMessage)
  }

  test("component subsampling: 4:2:0-style planes roundtrip at their own dims") {
    val rnd = new scala.util.Random(63)
    val w = 77; val h = 50
    def plane(cw: Int, ch: Int, salt: Int) =
      planeOf(cw, ch, 8, signed = false, (x, y) =>
        (x * 3 + y * salt + rnd.nextInt(64)) & 0xFF)
    // luma full-res; chroma 2x2-subsampled (the Sentinel-2 / JPEG 4:2:0
    // shape); one extra 2x1 component to pin asymmetric subsampling
    val planes = Seq(plane(w, h, 5),
      plane((w + 1) / 2, h / 2, 7), plane((w + 1) / 2, h / 2, 11),
      plane((w + 1) / 2, h, 13))
    val ss = Map(1 -> (2, 2), 2 -> (2, 2), 3 -> (2, 1))
    for (order <- Seq(0, 1, 2, 4); layers <- Seq(1, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 5,
        order = order, layers = layers, subsampling = ss)
      val back = Jpeg2000.decode(cs)
      assert(back.map(p => (p.w, p.h)) ==
        Seq((77, 50), (39, 25), (39, 25), (39, 50)))
      for (c <- planes.indices)
        assert(back(c).samples.toSeq == planes(c).samples.toSeq,
          s"order=$order layers=$layers comp=$c")
    }
    // composes with precincts, per-component code-blocks, level AND
    // transform overrides: chroma rides a 2-level 5/3 pyramid inside a
    // lossy 9/7 stream, still bit-exact at its own dims
    val cs2 = Jpeg2000.encode(planes, levels = 3, cbExp = 5, qstep = 1.0,
      precinct = Some((5, 5)), order = 1, subsampling = ss,
      cocTransform = Map(3 -> 1), cocLevels = Map(3 -> 2),
      cocCbExp = Map(1 -> 4))
    val back2 = Jpeg2000.decode(cs2)
    assert(back2(3).samples.toSeq == planes(3).samples.toSeq)
    for (c <- Seq(0, 1, 2)) {
      val me = planes(c).samples.zip(back2(c).samples)
        .map { case (u, v) => math.abs(u - v) }.max
      assert(me <= 8, s"comp=$c maxErr=$me")
    }
    // reduced decode halves every component's OWN dims
    val cs3 = Jpeg2000.encode(planes, levels = 3, cbExp = 5,
      subsampling = ss)
    val red = Jpeg2000.decode(cs3, 1)
    assert(red.map(p => (p.w, p.h)) ==
      Seq((39, 25), (20, 13), (20, 13), (20, 25)))
    // REDUCED windowed decode: each component returns the ceil-division
    // rect of the reduced window cropped from its own reduced plane
    // (full differential coverage in the windowed-decode spec)
    val rwins = Jpeg2000.decodeWindowAt(cs3, 1, 2, 3, 8, 8)
    assert(rwins.map(p => (p.w, p.h)) ==
      Seq((8, 8), (4, 5), (4, 5), (4, 8)))
    for (c <- planes.indices) {
      val (sx, sy) = ss.getOrElse(c, (1, 1))
      for (y <- 0 until rwins(c).h; x <- 0 until rwins(c).w)
        assert(rwins(c).samples(y * rwins(c).w + x) ==
          red(c).samples((3 / sy + y) * red(c).w + 2 / sx + x),
          s"comp=$c ($x,$y)")
    }
    // refusals: MCT, tiling, wrong plane dims
    val e2 = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes.take(3).map(_ => plane(w, h, 3)), levels = 2, mct = true,
      subsampling = Map(1 -> (2, 2))))
    assert(e2.getMessage.toLowerCase.contains("subsampling"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes, levels = 2, subsampling = ss, tileSize = Some((32, 32))))
    assert(e3.getMessage.toLowerCase.contains("subsampling"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](Jpeg2000.encode(
      Seq(plane(w, h, 5), plane(w, h, 7)), levels = 2,
      subsampling = Map(1 -> (2, 2))))
    assert(e4.getMessage.contains("expected"), e4.getMessage)
  }

  test("fuzz: random per-component level/transform/cb/precinct lattices") {
    // dense randomized sweep over the NEW per-component surface composed
    // with the old one — each draw randomizes size, depth, component
    // count, global levels/precincts/order/layers, and per-component
    // levels/transform/code-block overrides; reversible components must
    // roundtrip bit-exact, 9/7 components within the quantizer bound
    val rnd = new scala.util.Random(20260816)
    for (trial <- 0 until 30) {
      val w = 9 + rnd.nextInt(90)
      val h = 9 + rnd.nextInt(70)
      val nc = 1 + rnd.nextInt(4)
      val depth = Seq(8, 10, 12)(rnd.nextInt(3))
      // subsampling axis: comp 0 anchors the canvas; others may sample
      // every (1..3, 1..3) pixels and arrive at ceil(canvas / ss)
      val ssM: Map[Int, (Int, Int)] = (1 until nc).flatMap(c =>
        if (rnd.nextInt(3) == 0)
          Some(c -> (1 + rnd.nextInt(3), 1 + rnd.nextInt(3)))
        else None).toMap
      def dimsOf(c: Int): (Int, Int) = {
        val (sx, sy) = ssM.getOrElse(c, (1, 1))
        ((w + sx - 1) / sx, (h + sy - 1) / sy)
      }
      val planes = (0 until nc).map { c =>
        val (cw, ch) = dimsOf(c)
        planeOf(cw, ch, depth, signed = false, (x, y) =>
          (x * (c + 2) + y * 5 + rnd.nextInt(1 << (depth - 2))) %
            (1 << depth))
      }
      val levels = 1 + rnd.nextInt(3)
      val lossyStream = rnd.nextBoolean()
      val qstep = if (lossyStream) 0.5 + rnd.nextInt(3) * 0.5 else 0.0
      val order = rnd.nextInt(5)
      val layers = 1 + rnd.nextInt(3)
      val prec = if (rnd.nextBoolean()) Some((4 + rnd.nextInt(3),
        4 + rnd.nextInt(3))) else None
      def draw[T](f: => T): Map[Int, T] =
        (0 until nc).flatMap(c =>
          if (rnd.nextInt(3) == 0) Some(c -> f) else None).toMap
      val cocNl = draw(rnd.nextInt(levels + 1))
      // transform overrides: only 9/7 -> 5/3 inside a lossy stream (a
      // 9/7 override needs qstep > 0, which flips the whole COD)
      val cocTr = if (lossyStream) draw(1) else Map.empty[Int, Int]
      val cocCb = draw(3 + rnd.nextInt(3))
      // r17 axes: packed headers (PPM/PPT), a resolution-split POC, and
      // a maxshift ROI on a reversible component
      val ph = rnd.nextInt(3)
      val pocSegs =
        if (rnd.nextInt(3) == 0) {
          val rb = 1 + rnd.nextInt(levels)
          Seq((0, 0, layers, rb, nc, rnd.nextInt(5)),
            (rb, 0, layers, levels + 1, nc, rnd.nextInt(5)))
        } else Nil
      val pocTp = pocSegs.nonEmpty && rnd.nextBoolean()
      val roiM: Map[Int, (Int, Int, Int, Int)] =
        if (rnd.nextInt(3) == 0 && !lossyStream) {
          val c = rnd.nextInt(nc)
          val (cw, ch) = dimsOf(c)
          val rx = rnd.nextInt(cw); val ry = rnd.nextInt(ch)
          Map(c -> (rx, ry, 1 + rnd.nextInt(cw - rx), 1 + rnd.nextInt(ch - ry)))
        } else Map.empty
      val rgnTp = roiM.nonEmpty && rnd.nextBoolean()
      val tag = s"trial=$trial ${w}x$h nc=$nc d=$depth L=$levels " +
        s"q=$qstep o=$order l=$layers p=$prec nl=$cocNl tr=$cocTr " +
        s"cb=$cocCb ss=$ssM ph=$ph poc=$pocSegs tp=$pocTp roi=$roiM rtp=$rgnTp"
      val cs = Jpeg2000.encode(planes, levels = levels, cbExp = 5,
        qstep = qstep, order = order, layers = layers, precinct = prec,
        cocLevels = cocNl, cocTransform = cocTr, cocCbExp = cocCb,
        subsampling = ssM, packedHeaders = ph, poc = pocSegs, roi = roiM,
        pocInTilePart = pocTp, rgnInTilePart = rgnTp)
      val back = Jpeg2000.decode(cs)
      assert(back.length == nc, tag)
      for (c <- 0 until nc) {
        val reversible = !lossyStream || cocTr.get(c).contains(1)
        if (reversible)
          assert(back(c).samples.toSeq == planes(c).samples.toSeq,
            s"$tag comp=$c not bit-exact")
        else {
          val me = planes(c).samples.zip(back(c).samples)
            .map { case (u, v) => math.abs(u - v) }.max
          // reconstruction error <= ~8x the top-band effective step
          assert(me <= 8 * math.max(1.0, qstep) * (1 << (levels - 1)),
            s"$tag comp=$c maxErr=$me")
        }
      }
      // windowed decode differential across the WHOLE lattice: a random
      // full-resolution window equals the full decode's crop (per-
      // component ceil-division rects; exact on lossy components too —
      // same dequantization, sufficient lifting margins)
      locally {
        val wx = rnd.nextInt(w); val wy = rnd.nextInt(h)
        val ww2 = 1 + rnd.nextInt(w - wx); val wh2 = 1 + rnd.nextInt(h - wy)
        val wins = Jpeg2000.decodeWindow(cs, wx, wy, ww2, wh2)
        for (c <- 0 until nc) {
          val (sx, sy) = ssM.getOrElse(c, (1, 1))
          val cx0 = wx / sx; val cy0 = wy / sy
          val cw2 = (wx + ww2 + sx - 1) / sx - cx0
          val ch2 = (wy + wh2 + sy - 1) / sy - cy0
          assert(wins(c).w == cw2 && wins(c).h == ch2,
            s"$tag comp=$c win dims ${wins(c).w}x${wins(c).h}")
          for (y <- 0 until ch2; x <- 0 until cw2)
            assert(wins(c).samples(y * cw2 + x) ==
              back(c).samples((cy0 + y) * back(c).w + cx0 + x),
              s"$tag comp=$c win=($wx,$wy,$ww2,$wh2) at ($x,$y)")
        }
      }
      // reduced decode at the shallowest pyramid holds the size contract
      val dMax = (0 until nc).map(c => cocNl.getOrElse(c, levels)).min
      if (dMax > 0) {
        val red = Jpeg2000.decode(cs, 1)
        for (c <- 0 until nc) {
          val (cw, ch) = dimsOf(c)
          assert(red(c).w == (cw + 1) / 2 && red(c).h == (ch + 1) / 2,
            s"$tag comp=$c reduced ${red(c).w}x${red(c).h}")
        }
        // and a random REDUCED window equals the reduced decode's crop
        val rw = (w + 1) / 2; val rh = (h + 1) / 2
        val rx = rnd.nextInt(rw); val ry = rnd.nextInt(rh)
        val rwd = 1 + rnd.nextInt(rw - rx); val rht = 1 + rnd.nextInt(rh - ry)
        val rwins = Jpeg2000.decodeWindowAt(cs, 1, rx, ry, rwd, rht)
        for (c <- 0 until nc) {
          val (sx, sy) = ssM.getOrElse(c, (1, 1))
          val cx0 = rx / sx; val cy0 = ry / sy
          val cw2 = (rx + rwd + sx - 1) / sx - cx0
          val ch2 = (ry + rht + sy - 1) / sy - cy0
          assert(rwins(c).w == cw2 && rwins(c).h == ch2,
            s"$tag comp=$c redwin dims ${rwins(c).w}x${rwins(c).h}")
          for (y <- 0 until ch2; x <- 0 until cw2)
            assert(rwins(c).samples(y * cw2 + x) ==
              red(c).samples((cy0 + y) * red(c).w + cx0 + x),
              s"$tag comp=$c redwin=($rx,$ry,$rwd,$rht) at ($x,$y)")
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // Round 17: POC, PPM/PPT, RGN (self-emitted, differential-tested)
  // and the subsampled windowed decode scale path
  // ---------------------------------------------------------------

  test("POC progression changes: packaging-independent, gaps refuse") {
    val rnd = new scala.util.Random(1771)
    val planes = Seq.tabulate(2)(c =>
      planeOf(61, 47, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val enc0 = Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2)
    val plain = Jpeg2000.decode(enc0)
    val plainRed = Jpeg2000.decode(enc0, 1)
    // resolution split (LRCP head, RPCL tail), component split, layer
    // split with an OVERLAPPING second segment (dedup keeps first
    // placement) — each also composed with precincts and SOP/EPH
    val shapes = Seq(
      Seq((0, 0, 2, 1, 2, 0), (1, 0, 2, 3, 2, 2)),
      Seq((0, 0, 2, 3, 1, 1), (0, 1, 2, 3, 2, 4)),
      Seq((0, 0, 1, 3, 2, 3), (0, 0, 2, 3, 2, 0)))
    for ((segs, i) <- shapes.zipWithIndex;
        prec <- Seq(None, Some((4, 4))); sop <- Seq(false, true)) {
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2,
        poc = segs, precinct = prec, sopEph = sop)
      // the POC marker is actually in the stream
      assert(cs.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0x5F), s"shape $i")
      val tag = s"shape=$i prec=$prec sop=$sop"
      samePlanes(Jpeg2000.decode(cs), plain, tag)
      samePlanes(Jpeg2000.decode(cs, 1), plainRed, s"$tag reduced")
      // windowed decode walks the POC sequence too
      val wp = Jpeg2000.decodeWindow(cs, 13, 9, 17, 11)
      plain.zip(wp).zipWithIndex.foreach { case ((f, p2), ci) =>
        for (y <- 0 until 11; x <- 0 until 17)
          assert(p2.samples(y * 17 + x) == f.samples((y + 9) * 61 + x + 13),
            s"$tag win comp $ci ($x,$y)")
      }
    }
    // a POC that covers only resolution 0 refuses at ENCODE (the shared
    // sequencer), and a stream whose POC is byte-poked into a gap
    // refuses at DECODE
    val eGap = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes, levels = 2, cbExp = 4, poc = Seq((0, 0, 1, 1, 2, 0))))
    assert(eGap.getMessage.contains("cover"), eGap.getMessage)
    val csOk = Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2,
      poc = Seq((0, 0, 2, 1, 2, 0), (1, 0, 2, 3, 2, 2)))
    val idx = csOk.indices.dropRight(1).find(j =>
      (csOk(j) & 0xFF) == 0xFF && (csOk(j + 1) & 0xFF) == 0x5F).get
    val mutated = csOk.clone()
    mutated(idx + 4 + 7 + 4) = 2 // second segment's REpoc: 3 -> 2 (gap at r=2)
    val eDec = intercept[IllegalArgumentException](Jpeg2000.decode(mutated))
    assert(eDec.getMessage.contains("cover"), eDec.getMessage)
  }

  test("tile-part-header POC: per-tile progression decodes identically") {
    val rnd = new scala.util.Random(9917)
    val planes = Seq.tabulate(2)(c =>
      planeOf(96, 64, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val plain = Jpeg2000.decode(
      Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2))
    val segs = Seq((0, 0, 2, 1, 2, 0), (1, 0, 2, 3, 2, 2))
    // single-tile and multi-tile (each tile carries its own POC marker)
    for (tiles <- Seq(None, Some((32, 32))); ph <- Seq(0, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2,
        tileSize = tiles, poc = segs, pocInTilePart = true, packedHeaders = ph)
      // the POC marker sits AFTER the first SOT, not in the main header
      val sotAt = cs.indices.dropRight(1).find(j =>
        (cs(j) & 0xFF) == 0xFF && (cs(j + 1) & 0xFF) == 0x90).get
      val pocAt = cs.indices.dropRight(1).find(j =>
        (cs(j) & 0xFF) == 0xFF && (cs(j + 1) & 0xFF) == 0x5F).get
      assert(pocAt > sotAt, s"tiles=$tiles ph=$ph POC at $pocAt, SOT at $sotAt")
      samePlanes(Jpeg2000.decode(cs), plain, s"tiles=$tiles ph=$ph")
      // reduced baseline must share the TILING (per-tile pyramids make
      // the reduced LL tiling-dependent even though full-res is not)
      samePlanes(Jpeg2000.decode(cs, 1), Jpeg2000.decode(
        Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2,
          tileSize = tiles), 1),
        s"tiles=$tiles ph=$ph reduced")
      // prefix reads refuse under a tile-part POC (order unknowable)
      assert(Jpeg2000.prefixLenFor(cs, 1).isEmpty, s"tiles=$tiles ph=$ph")
    }
    // a POC in a NON-first tile-part refuses: splice the main-header-POC
    // encoding's marker into TPsot=1 of a per-resolution stream
    val csParts = Jpeg2000.encode(planes, levels = 2, cbExp = 4, order = 1,
      partsPerResolution = true)
    // find the SECOND SOT and insert a POC right after its 12-byte header
    val sots = csParts.indices.dropRight(1).filter(j =>
      (csParts(j) & 0xFF) == 0xFF && (csParts(j + 1) & 0xFF) == 0x90)
    assert(sots.length >= 2)
    val at = sots(1) + 12
    val pocMarker = Array[Byte](0xFF.toByte, 0x5F.toByte, 0, 9,
      0, 0, 0, 1, 3, 2, 2)
    val spliced = csParts.take(at) ++ pocMarker ++ csParts.drop(at)
    // patch the spliced part's Psot so the tile-part walk stays aligned
    // and the refusal UNDER TEST (not a bogus 'expected SOT' from a
    // stale length) is the one that fires
    val bbS = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bbS.putInt(sots(1) + 6, bbS.getInt(sots(1) + 6) + pocMarker.length)
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(spliced))
    assert(e.getMessage.contains("non-first"), e.getMessage)
  }

  test("tile-part-header RGN: per-tile ROI shift decodes bit-exact") {
    val rnd = new scala.util.Random(8114)
    val planes = Seq.tabulate(2)(c =>
      planeOf(96, 64, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val plain = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 2, cbExp = 4))
    val roiC = Map(0 -> (10, 8, 30, 20))
    for (tiles <- Seq(None, Some((32, 32))); ph <- Seq(0, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4,
        tileSize = tiles, roi = roiC, rgnInTilePart = true, packedHeaders = ph)
      val sotAt = cs.indices.dropRight(1).find(j =>
        (cs(j) & 0xFF) == 0xFF && (cs(j + 1) & 0xFF) == 0x90).get
      val rgnAt = cs.indices.dropRight(1).find(j =>
        (cs(j) & 0xFF) == 0xFF && (cs(j + 1) & 0xFF) == 0x5E).get
      assert(rgnAt > sotAt, s"tiles=$tiles ph=$ph RGN at $rgnAt, SOT at $sotAt")
      samePlanes(Jpeg2000.decode(cs), plain, s"tiles=$tiles ph=$ph")
      // windowed decode applies the per-tile downshift too
      val wp = Jpeg2000.decodeWindow(cs, 12, 9, 17, 13)
      plain.zip(wp).foreach { case (f, p2) =>
        for (y <- 0 until 13; x <- 0 until 17)
          assert(p2.samples(y * 17 + x) == f.samples((y + 9) * 96 + x + 12),
            s"tiles=$tiles ph=$ph win ($x,$y)")
      }
    }
    // RGN in a NON-first tile-part refuses (mid-stream Mb change)
    val csParts = Jpeg2000.encode(planes, levels = 2, cbExp = 4, order = 1,
      partsPerResolution = true)
    val sots = csParts.indices.dropRight(1).filter(j =>
      (csParts(j) & 0xFF) == 0xFF && (csParts(j + 1) & 0xFF) == 0x90)
    val at = sots(1) + 12
    val rgn = Array[Byte](0xFF.toByte, 0x5E.toByte, 0, 5, 0, 0, 5)
    val spliced = csParts.take(at) ++ rgn ++ csParts.drop(at)
    // Psot patch: see the POC twin — the tpsot refusal must be what fires
    val bbS = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bbS.putInt(sots(1) + 6, bbS.getInt(sots(1) + 6) + rgn.length)
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(spliced))
    assert(e.getMessage.contains("non-first"), e.getMessage)
    // main-header + tile-part RGN MIX (a foreign shape this encoder
    // never emits): tile-part entries override PER COMPONENT (A.6.3) —
    // the spliced main-header shift on component 1 must SURVIVE the
    // merge, where it trips the decoder's 31-bit Mb refusal (the old
    // whole-table replacement silently dropped it)
    val csTileRgn = Jpeg2000.encode(planes, levels = 2, cbExp = 4,
      roi = Map(0 -> (10, 8, 30, 20)), rgnInTilePart = true)
    val sot0 = csTileRgn.indices.dropRight(1).find(j =>
      (csTileRgn(j) & 0xFF) == 0xFF && (csTileRgn(j + 1) & 0xFF) == 0x90).get
    val mainRgn = Array[Byte](0xFF.toByte, 0x5E.toByte, 0, 5, 1, 0, 25)
    val mixed = csTileRgn.take(sot0) ++ mainRgn ++ csTileRgn.drop(sot0)
    val e2 = intercept[IllegalArgumentException](Jpeg2000.decode(mixed))
    assert(e2.getMessage.contains("31-bit"), e2.getMessage)
    // an out-of-range SPrgn refuses at parse in BOTH header positions
    val badRgn = Array[Byte](0xFF.toByte, 0x5E.toByte, 0, 5, 1, 0, 38)
    val bad = csTileRgn.take(sot0) ++ badRgn ++ csTileRgn.drop(sot0)
    val e3 = intercept[IllegalArgumentException](Jpeg2000.decode(bad))
    assert(e3.getMessage.contains("out of range"), e3.getMessage)
  }

  test("PPM/PPT packed packet headers: relocated headers decode identically") {
    val rnd = new scala.util.Random(2206)
    val planes = Seq.tabulate(3)(c =>
      planeOf(70, 52, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val enc0 = Jpeg2000.encode(planes, levels = 2, cbExp = 4, mct = true)
    val plain = Jpeg2000.decode(enc0)
    val plainRed = Jpeg2000.decode(enc0, 1)
    for (ph <- Seq(1, 2); order <- Seq(0, 2); layers <- Seq(1, 3);
        sop <- Seq(false, true)) {
      val tag = s"ph=$ph order=$order layers=$layers sop=$sop"
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4, mct = true,
        order = order, layers = layers, sopEph = sop, packedHeaders = ph,
        precinct = Some((4, 4)))
      val marker = if (ph == 1) 0x60 else 0x61
      assert(cs.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == marker), tag)
      samePlanes(Jpeg2000.decode(cs), plain, tag)
      samePlanes(Jpeg2000.decode(cs, 1), plainRed, s"$tag reduced")
      val wp = Jpeg2000.decodeWindow(cs, 11, 7, 19, 13)
      plain.zip(wp).foreach { case (f, p2) =>
        for (y <- 0 until 13; x <- 0 until 19)
          assert(p2.samples(y * 19 + x) == f.samples((y + 7) * 70 + x + 11),
            s"$tag win ($x,$y)")
      }
    }
    // multi-tile: PPM keys records on the GLOBAL tile-part ordinal, PPT
    // stays tile-local — both must reassemble bit-exact
    for (ph <- Seq(1, 2)) {
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4,
        tileSize = Some((32, 32)), packedHeaders = ph)
      samePlanes(Jpeg2000.decode(cs), plain, s"tiled ph=$ph")
    }
    // packed headers compose with POC and subsampling
    val ss = Map(1 -> (2, 2), 2 -> (2, 2))
    val planesSS = Seq(planes(0), planeOf(35, 26, 8, signed = false,
      (x, y) => rnd.nextInt(256)), planeOf(35, 26, 8, signed = false,
      (x, y) => rnd.nextInt(256)))
    val basSS = Jpeg2000.decode(Jpeg2000.encode(planesSS, levels = 2,
      cbExp = 4, subsampling = ss))
    for (ph <- Seq(1, 2)) {
      val cs = Jpeg2000.encode(planesSS, levels = 2, cbExp = 4,
        subsampling = ss, packedHeaders = ph,
        poc = Seq((0, 0, 1, 1, 3, 0), (1, 0, 1, 3, 3, 2)))
      samePlanes(Jpeg2000.decode(cs), basSS, s"ss+poc ph=$ph")
    }
  }

  test("RGN maxshift ROI: bit-exact roundtrip; lossy ROI refuses") {
    val rnd = new scala.util.Random(5212)
    val planes = Seq.tabulate(2)(c =>
      planeOf(66, 49, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val plain = Jpeg2000.decode(Jpeg2000.encode(planes, levels = 2, cbExp = 4))
    for (roiC <- Seq(Map(0 -> (10, 8, 20, 15)),
        Map(0 -> (0, 0, 66, 49), 1 -> (40, 30, 26, 19)));
        layers <- Seq(1, 2); order <- Seq(0, 2)) {
      val tag = s"roi=$roiC layers=$layers order=$order"
      val cs = Jpeg2000.encode(planes, levels = 2, cbExp = 4,
        layers = layers, order = order, roi = roiC)
      assert(cs.sliding(2).exists(p =>
        (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0x5E), tag)
      samePlanes(Jpeg2000.decode(cs), plain, tag)
      // the downshift composes with reduced and windowed decodes
      samePlanes(Jpeg2000.decode(cs, 1),
        Jpeg2000.decode(Jpeg2000.encode(planes, levels = 2, cbExp = 4), 1),
        s"$tag reduced")
      val wp = Jpeg2000.decodeWindow(cs, 5, 3, 21, 17)
      plain.zip(wp).foreach { case (f, p2) =>
        for (y <- 0 until 17; x <- 0 until 21)
          assert(p2.samples(y * 21 + x) == f.samples((y + 3) * 66 + x + 5),
            s"$tag win ($x,$y)")
      }
    }
    // composes with COC level overrides, precincts, POC, packed headers
    val cs2 = Jpeg2000.encode(planes, levels = 2, cbExp = 4, layers = 2,
      roi = Map(1 -> (5, 5, 30, 20)), cocLevels = Map(1 -> 1),
      precinct = Some((4, 4)), packedHeaders = 2,
      poc = Seq((0, 0, 2, 1, 2, 0), (1, 0, 2, 3, 2, 2)))
    samePlanes(Jpeg2000.decode(cs2), plain, "roi+coc+poc+ppt")
    // 16-bit depth keeps the doubled-Mb budget in range
    val deep = Seq(planeOf(40, 30, 12, signed = false,
      (x, y) => rnd.nextInt(1 << 12)))
    samePlanes(Jpeg2000.decode(Jpeg2000.encode(deep, levels = 2, cbExp = 4,
      roi = Map(0 -> (8, 8, 16, 12)))), Seq(deep(0)).map(p =>
        Jpeg2000.decode(Jpeg2000.encode(Seq(p), levels = 2, cbExp = 4)).head),
      "12-bit roi")
    // ROI on a 9/7 component refuses at encode AND at decode (byte-poked)
    val eEnc = intercept[IllegalArgumentException](Jpeg2000.encode(
      planes, levels = 2, cbExp = 4, qstep = 1.0, roi = Map(0 -> (0, 0, 8, 8))))
    assert(eEnc.getMessage.contains("9/7"), eEnc.getMessage)
    val csL = Jpeg2000.encode(planes, levels = 2, cbExp = 4, qstep = 1.0)
    // splice an RGN (comp 0, maxshift, shift 5) before the first SOT
    val sotAt = csL.indices.dropRight(1).find(j =>
      (csL(j) & 0xFF) == 0xFF && (csL(j + 1) & 0xFF) == 0x90).get
    val rgn = Array[Byte](0xFF.toByte, 0x5E.toByte, 0, 5, 0, 0, 5)
    val spliced = csL.take(sotAt) ++ rgn ++ csL.drop(sotAt)
    val eDec = intercept[IllegalArgumentException](Jpeg2000.decode(spliced))
    assert(eDec.getMessage.contains("9/7"), eDec.getMessage)
  }

  test("subsampled windowed decode ≡ full decode crop (4:2:0 scale path)") {
    val rnd = new scala.util.Random(420420)
    val w = 83; val h = 57
    val planes = Seq(
      planeOf(w, h, 8, signed = false, (x, y) => rnd.nextInt(256)),
      planeOf((w + 1) / 2, (h + 1) / 2, 8, signed = false,
        (x, y) => rnd.nextInt(256)),
      planeOf((w + 1) / 2, (h + 1) / 2, 8, signed = false,
        (x, y) => rnd.nextInt(256)),
      planeOf((w + 2) / 3, h, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val ss = Map(1 -> (2, 2), 2 -> (2, 2), 3 -> (3, 1))
    for (prec <- Seq(None, Some((4, 4))); ph <- Seq(0, 1)) {
      val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 4,
        subsampling = ss, precinct = prec, packedHeaders = ph)
      val full = Jpeg2000.decode(cs)
      // windows at odd/even offsets, spanning subsample-phase boundaries
      // and the image edges
      for ((wx, wy, ww2, wh2) <- Seq((0, 0, 8, 8), (13, 9, 22, 17),
          (14, 10, 21, 16), (w - 9, h - 7, 9, 7), (0, h - 1, w, 1))) {
        val wins = Jpeg2000.decodeWindow(cs, wx, wy, ww2, wh2)
        for (c <- planes.indices) {
          val (sx, sy) = ss.getOrElse(c, (1, 1))
          val cx0 = wx / sx; val cy0 = wy / sy
          val cw = (wx + ww2 + sx - 1) / sx - cx0
          val ch = (wy + wh2 + sy - 1) / sy - cy0
          val wp = wins(c)
          assert(wp.w == cw && wp.h == ch,
            s"prec=$prec ph=$ph comp=$c win ${wp.w}x${wp.h} want ${cw}x$ch")
          val fw = full(c).w
          for (y <- 0 until ch; x <- 0 until cw)
            assert(wp.samples(y * cw + x) ==
              full(c).samples((cy0 + y) * fw + cx0 + x),
              s"prec=$prec ph=$ph comp=$c ($x,$y)")
        }
      }
    }
    // byte-economics of the scale path: a small window must entropy-
    // decode FAR fewer code-blocks than the full decode (selective
    // EBCOT is what makes windowed reads of big subsampled scenes
    // cheap — the whole point of supporting them)
    val bigW = 320; val bigH = 224
    val bigPlanes = Seq(
      planeOf(bigW, bigH, 8, signed = false, (x, y) => rnd.nextInt(256)),
      planeOf(bigW / 2, bigH / 2, 8, signed = false, (x, y) => rnd.nextInt(256)),
      planeOf(bigW / 2, bigH / 2, 8, signed = false, (x, y) => rnd.nextInt(256)))
    val csBig = Jpeg2000.encode(bigPlanes, levels = 3, cbExp = 4,
      subsampling = Map(1 -> (2, 2), 2 -> (2, 2)))
    Jpeg2000.decode(csBig)
    val fullBlocks = Jpeg2000.lastEbcotBlocks.get.intValue
    Jpeg2000.decodeWindow(csBig, 150, 100, 8, 8)
    val winBlocks = Jpeg2000.lastEbcotBlocks.get.intValue
    assert(fullBlocks > 0 && winBlocks > 0 && winBlocks * 4 < fullBlocks,
      s"selective EBCOT: window decoded $winBlocks of $fullBlocks blocks")
    // REDUCED-resolution windows (level-d coordinates): each component
    // returns the ceil-division rect of the window within its OWN
    // reduced plane — identical to cropping the full reduced decode
    // (the mapping commutes: ceil(ceil(n/2^d)/s) == ceil(ceil(n/s)/2^d))
    val cs0 = Jpeg2000.encode(planes, levels = 3, cbExp = 4, subsampling = ss)
    for (d <- 1 to 2) {
      val redFull = Jpeg2000.decode(cs0, d)
      val rw = (0 until d).foldLeft(w)((n, _) => (n + 1) / 2)
      val rh = (0 until d).foldLeft(h)((n, _) => (n + 1) / 2)
      for ((wx, wy, ww2, wh2) <- Seq((0, 0, 4, 4), (3, 5, 9, 7),
          (rw - 5, rh - 3, 5, 3), (1, 0, rw - 1, rh))) {
        val wins = Jpeg2000.decodeWindowAt(cs0, d, wx, wy, ww2, wh2)
        for (c <- planes.indices) {
          val (sx, sy) = ss.getOrElse(c, (1, 1))
          val cx0 = wx / sx; val cy0 = wy / sy
          val cw = (wx + ww2 + sx - 1) / sx - cx0
          val ch = (wy + wh2 + sy - 1) / sy - cy0
          val wp = wins(c)
          assert(wp.w == cw && wp.h == ch,
            s"d=$d comp=$c win ${wp.w}x${wp.h} want ${cw}x$ch")
          val fw = redFull(c).w
          for (y <- 0 until ch; x <- 0 until cw)
            assert(wp.samples(y * cw + x) ==
              redFull(c).samples((cy0 + y) * fw + cx0 + x),
              s"d=$d comp=$c ($x,$y) win=($wx,$wy,$ww2,$wh2)")
        }
      }
    }
    // a mixed lossy/reversible subsampled stream takes the double
    // assembly through the same reduced-window crop
    val csL = Jpeg2000.encode(planes, levels = 3, cbExp = 4,
      subsampling = ss, qstep = 2.0, cocTransform = Map(3 -> 1))
    val redL = Jpeg2000.decode(csL, 1)
    val winsL = Jpeg2000.decodeWindowAt(csL, 1, 3, 2, 10, 9)
    for (c <- planes.indices) {
      val (sx, sy) = ss.getOrElse(c, (1, 1))
      val cx0 = 3 / sx; val cy0 = 2 / sy
      val cw = (3 + 10 + sx - 1) / sx - cx0
      val ch = (2 + 9 + sy - 1) / sy - cy0
      val wp = winsL(c)
      assert(wp.w == cw && wp.h == ch, s"lossy comp=$c")
      val fw = redL(c).w
      for (y <- 0 until ch; x <- 0 until cw)
        assert(wp.samples(y * cw + x) ==
          redL(c).samples((cy0 + y) * fw + cx0 + x), s"lossy comp=$c ($x,$y)")
    }
  }

  test("COC + multi-tile + per-resolution tile-parts + reduced decode compose") {
    val rnd = new scala.util.Random(59)
    val w = 128; val h = 96
    val planes = (0 until 3).map { c =>
      planeOf(w, h, 8, signed = false, (x, y) =>
        (x * 2 + y * (c + 1) + rnd.nextInt(32)) & 0xFF)
    }
    val cs = Jpeg2000.encode(planes, levels = 3, cbExp = 5,
      tileSize = Some((64, 32)), order = 2, precinct = Some((5, 5)),
      partsPerResolution = true,
      cocCbExp = Map(1 -> 4), cocPrecinct = Map(0 -> (4, 4)))
    val back = Jpeg2000.decode(cs)
    for (c <- 0 until 3)
      assert(back(c).samples.toSeq == planes(c).samples.toSeq, s"comp=$c")
    // reduced decode agrees with the per-tile LL of a reference decode
    val red = Jpeg2000.decode(cs, 1)
    assert(red.head.w == w / 2 && red.head.h == h / 2)
    // derived quantization composes with COC overrides (lossy)
    val csL = Jpeg2000.encode(planes, levels = 3, cbExp = 5, qstep = 2.0,
      derivedQuant = true, cocCbExp = Map(2 -> 4))
    val backL = Jpeg2000.decode(csL)
    for (c <- 0 until 3) {
      val me = planes(c).samples.zip(backL(c).samples)
        .map { case (u, v) => math.abs(u - v) }.max
      assert(me <= 100, s"comp=$c maxErr=$me")
    }
  }

}
