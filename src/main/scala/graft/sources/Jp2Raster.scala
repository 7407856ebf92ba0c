package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.functions.RasterModel
import graft.functions.RasterModel.{Band, Raster}

/** JP2 container glue between the in-memory raster model and the
  * [[Jpeg2000]] codestream codec: integer-typed bands become image
  * components, and georeferencing travels as a GeoJP2 `uuid` box
  * holding a degenerate 1x1 GeoTIFF with the raster's CRS and
  * geotransform — the exact mechanism GDAL reads/writes, reusing this
  * repo's own GeoTIFF codec for the embedded payload. The reference
  * reaches JP2 rasters through GDAL's openjpeg driver
  * (rust/sedona-raster-gdal/src/register.rs:23-34). Band nodata
  * metadata has no JP2 slot and does not survive the roundtrip. */
private[graft] object Jp2Raster {

  /** GeoJP2 UUID (the GeoTIFF-in-JP2 convention). */
  private val GeoJp2Uuid: Array[Byte] = Array(
    0xBE, 0x7A, 0xCF, 0xCB, 0x97, 0xA9, 0x42, 0xE8,
    0x9C, 0x71, 0x99, 0x94, 0x91, 0xE3, 0xAF, 0xAC).map(_.toByte)

  private val IntTypes: Map[String, (Int, Boolean)] = Map(
    "UNSIGNED_8BITS" -> ((8, false)),
    "SIGNED_8BITS" -> ((8, true)),
    "UNSIGNED_16BITS" -> ((16, false)),
    "SIGNED_16BITS" -> ((16, true)))

  private def typeName(depth: Int, signed: Boolean): String =
    (if (signed) "SIGNED_" else "UNSIGNED_") + depth + "BITS"

  /** Raster -> JP2 file bytes (signature/ftyp/jp2h/GeoJP2 uuid/jp2c).
    * `tileSize` produces a TILED codestream (independent tiles + TLM
    * byte directory) — the layout that lets the out-db loader fetch
    * only the tiles a window intersects. `qstep > 0` selects the LOSSY
    * 9/7 path (see Jpeg2000.encode) — quicklooks and lossy archives;
    * 3-band rasters then get the irreversible ICT. `layers`/`order`/
    * `precinct`/`sopEph` select the packet packaging (quality layers,
    * progression order 0..4 = LRCP/RLCP/RPCL/PCRL/CPRL, precinct
    * exponents, SOP/EPH resync) — the knobs real Kakadu/openjpeg
    * Sentinel-2 profiles use. */
  def write(r: Raster, levels: Int = 5,
      tileSize: Option[(Int, Int)] = None, qstep: Double = 0.0,
      layers: Int = 1, order: Int = 0,
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
      roi: Map[Int, (Int, Int, Int, Int)] = Map.empty): Array[Byte] = {
    require(r.bands.nonEmpty, "rs_asjpeg2000: raster has no loaded bands")
    val planes = r.bands.zipWithIndex.map { case (b, bi) =>
      val (depth, signed) = IntTypes.getOrElse(b.pixelTypeName,
        throw new IllegalArgumentException(
          s"rs_asjpeg2000: band ${bi + 1} is ${b.pixelTypeName}; JPEG 2000 " +
            "lossless supports integer bands up to 16 bits " +
            "(set UNSIGNED_8BITS/SIGNED_8BITS/UNSIGNED_16BITS/SIGNED_16BITS " +
            "via rs_setbandpixeltype)"))
      val lo = if (signed) -(1 << (depth - 1)) else 0
      val hi = if (signed) (1 << (depth - 1)) - 1 else (1 << depth) - 1
      val bb = ByteBuffer.wrap(b.data).order(ByteOrder.LITTLE_ENDIAN)
      // a subsampled component (SIZ XRsiz/YRsiz, the 4:2:0 chroma shape)
      // is TOP-LEFT DECIMATED from the band's canvas grid — the exact
      // inverse of the reader's sample-replication upsampling, so
      // cell-constant content roundtrips bit-exact
      val (sx, sy) = subsampling.getOrElse(bi, (1, 1))
      val pw = (r.width + sx - 1) / sx
      val ph = (r.height + sy - 1) / sy
      val samples = new Array[Int](pw * ph)
      var py = 0
      while (py < ph) {
        var px = 0
        while (px < pw) {
          val i = (py * sy) * r.width + px * sx
          val v = bb.getDouble(i * 8)
          val iv = math.rint(v).toInt
          require(iv == v && iv >= lo && iv <= hi,
            s"rs_asjpeg2000: band ${bi + 1} pixel $i = $v is not an " +
              s"integer in [$lo, $hi] for ${b.pixelTypeName}")
          samples(py * pw + px) = iv
          px += 1
        }
        py += 1
      }
      Jpeg2000.Plane(pw, ph, depth, signed, samples)
    }
    require(planes.map(p => (p.depth, p.signed)).distinct.size == 1,
      "rs_asjpeg2000: all bands must share one pixel type (ihdr bpc)")
    // 3-band rasters get the reversible color transform — the lossless
    // RGB decorrelation GDAL's openjpeg writer applies by default.
    // A per-component transform override is incompatible with the MCT
    // (it couples components 0-2 through one transform), so it wins;
    // subsampling likewise (MCT needs equal component grids).
    val cs = Jpeg2000.encode(planes, levels = levels,
      mct = planes.length == 3 && cocTransform.isEmpty && subsampling.isEmpty,
      tileSize = tileSize, qstep = qstep,
      layers = layers, order = order, precinct = precinct, sopEph = sopEph,
      partsPerResolution = partsPerResolution, derivedQuant = derivedQuant,
      cocCbExp = cocCbExp, cocPrecinct = cocPrecinct,
      cocLevels = cocLevels, cocTransform = cocTransform,
      subsampling = subsampling,
      poc = poc, packedHeaders = packedHeaders, roi = roi)

    val out = new java.io.ByteArrayOutputStream()
    def box(tp: String, payload: Array[Byte]): Unit = {
      val len = 8 + payload.length
      out.write(Array[Byte]((len >> 24).toByte, (len >> 16).toByte,
        (len >> 8).toByte, len.toByte))
      out.write(tp.getBytes("ISO-8859-1"))
      out.write(payload)
    }
    box("jP  ", Array[Byte](0x0D, 0x0A, 0x87.toByte, 0x0A))
    box("ftyp", "jp2     jp2 ".getBytes("ISO-8859-1"))
    // jp2h = ihdr + colr
    val jp2h = new java.io.ByteArrayOutputStream()
    val ihdr = ByteBuffer.allocate(14)
    ihdr.putInt(r.height).putInt(r.width)
      .putShort(planes.length.toShort)
      .put((((planes.head.depth - 1) | (if (planes.head.signed) 0x80 else 0)).toByte))
      .put(7.toByte) // compression type 7 (wavelet)
      .put(0.toByte).put(0.toByte)
    val colr = Array[Byte](1, 0, 0, 0, 0, 0,
      (if (planes.length == 3) 16 else 17).toByte)
    def sub(tp: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length)
      b.put(tp.getBytes("ISO-8859-1"))
      b.put(payload)
      b.array()
    }
    jp2h.write(sub("ihdr", ihdr.array()))
    jp2h.write(sub("colr", colr))
    box("jp2h", jp2h.toByteArray)
    // GeoJP2: a degenerate 1x1 GeoTIFF carrying crs + geotransform
    if (r.crs != null && r.crs.nonEmpty) {
      val geo = Raster(r.crs, r.gt, 1, 1,
        Vector(Band(Double.NaN, RasterModel.packDoubles(Array(0.0)))))
      box("uuid", GeoJp2Uuid ++ GeoTiff.writeCompressed(geo, 1))
    }
    box("jp2c", cs)
    out.toByteArray
  }

  /** True when the bytes are a JP2 container or a raw codestream. */
  def sniff(bytes: Array[Byte]): Boolean =
    (bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0x4F && (bytes(2) & 0xFF) == 0xFF &&
      (bytes(3) & 0xFF) == 0x51) ||
    (bytes.length >= 12 && bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 0 &&
      (bytes(3) & 0xFF) == 0x0C && bytes(4) == 'j'.toByte &&
      bytes(5) == 'P'.toByte)

  /** Per-component SIZ subsampling factors, (1,1) when the stream has
    * none (or the header is not parseable as a layout — equal-dim
    * planes then hold by construction). */
  private def ssTable(bytes: Array[Byte]): Int => (Int, Int) =
    try { val hd = Jpeg2000.layout(bytes); c => hd.ssOf(c) }
    catch { case _: Exception => _ => (1, 1) }

  /** Sample-replication upsampling of a (possibly subsampled) component
    * plane onto the shared canvas grid: band pixel (x, y) = plane
    * sample (x/sx, y/sy) — every band on ONE grid, the presentation a
    * GDAL-style consumer of a 4:2:0 JP2 expects. The top-left
    * replication is the exact inverse of the writer's top-left
    * decimation, so cell-constant content roundtrips bit-exact.
    * `x0`/`y0` give the canvas origin of a windowed read (the plane
    * then starts at plane coords (x0/sx, y0/sy)); the same mapping is
    * valid in reduced coordinates because nested ceil-divisions
    * compose. */
  private def upsample(p: Jpeg2000.Plane, sx: Int, sy: Int,
      w: Int, h: Int, x0: Int = 0, y0: Int = 0): Array[Double] = {
    val vals = new Array[Double](w * h)
    if (sx == 1 && sy == 1) {
      require(p.w == w && p.h == h,
        s"jp2 raster: plane ${p.w}x${p.h} != expected ${w}x$h")
      var i = 0
      while (i < vals.length) { vals(i) = p.samples(i).toDouble; i += 1 }
    } else {
      val px0 = x0 / sx; val py0 = y0 / sy
      var y = 0
      while (y < h) {
        val pr = ((y0 + y) / sy - py0) * p.w
        var x = 0
        while (x < w) {
          vals(y * w + x) = p.samples(pr + ((x0 + x) / sx - px0)).toDouble
          x += 1
        }
        y += 1
      }
    }
    vals
  }

  /** JP2/codestream bytes -> Raster (CRS/geotransform from the GeoJP2
    * uuid box when present; identity grid otherwise). Subsampled
    * components are replication-upsampled onto the canvas grid (see
    * [[upsample]]); read via Jpeg2000.decode for the raw per-component
    * planes. */
  def read(bytes: Array[Byte]): Raster = {
    val planes = Jpeg2000.decode(bytes)
    val (crs, gt) = geoOf(bytes).getOrElse(
      ("", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))
    val (w, h, _, _) = Jpeg2000.info(bytes)
    val ss = ssTable(bytes)
    val bands = planes.zipWithIndex.map { case (p, c) =>
      val (sx, sy) = ss(c)
      Band(Double.NaN, RasterModel.packDoubles(upsample(p, sx, sy, w, h)),
        ptype = typeName(p.depth, p.signed))
    }
    Raster(crs, gt, w, h, bands.toIndexedSeq)
  }

  /** Decode at a reduced resolution (see Jpeg2000.decode(bytes, d));
    * subsampled components replication-upsample onto the reduced canvas
    * grid (the factor-sx mapping holds at every level — ceil-divisions
    * compose). */
  def readAt(bytes: Array[Byte], discardLevels: Int): Raster = {
    val planes = Jpeg2000.decode(bytes, discardLevels)
    val (crs, gt0) = geoOf(bytes).getOrElse(
      ("", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))
    val s = (1 << discardLevels).toDouble
    val gt = Array(gt0(0), gt0(1) * s, gt0(2) * s, gt0(3), gt0(4) * s, gt0(5) * s)
    val (cw, chh, _, _) = Jpeg2000.info(bytes)
    val w = Jpeg2000Dims.lowLen(cw, discardLevels)
    val h = Jpeg2000Dims.lowLen(chh, discardLevels)
    val ss = ssTable(bytes)
    val bands = planes.zipWithIndex.map { case (p, c) =>
      val (sx, sy) = ss(c)
      Band(Double.NaN, RasterModel.packDoubles(upsample(p, sx, sy, w, h)),
        ptype = typeName(p.depth, p.signed))
    }
    Raster(crs, gt, w, h, bands.toIndexedSeq)
  }

  /** Out-db loader for `rs_frompath('….jp2')`: header-bounded metadata
    * and BOTH of the format's native scale axes —
    *
    *  - spatial windows: on a TILED codestream (the Sentinel-2 layout),
    *    the main-header TLM gives every tile-part's byte range, so a
    *    window fetches ONLY the tiles it intersects (stitched into a
    *    partial codestream) and the selective-EBCOT windowed decode
    *    then skips the non-window code-blocks inside them; a
    *    single-tile stream falls back to a whole-file fetch with the
    *    same selective-EBCOT decode;
    *  - overviews: each decomposition level is a 1/2-per-axis reduced
    *    decode that consumes only each tile's LEADING packets — the
    *    per-tile PLT gives the exact prefix, so the fetch per tile is
    *    kilobytes, not the scene. */
  object OutDb extends RasterLoaders.Loader {
    private val HeaderProbe = 256 * 1024
    private val TilePeek = 8 * 1024

    def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster = {
      val head = fetch(0L, math.min(fileLen, HeaderProbe.toLong).toInt)
      val (w, h, nc, _) = Jpeg2000.info(head)
      val (crs, gt) = geoOf(head).getOrElse(
        ("", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))
      Raster(crs, gt, w, h, Vector.empty)
    }

    def load(bytes: Array[Byte]): Raster = read(bytes)

    /** Tile indices intersecting a window given in level-`d` (reduced)
      * coordinates. */
    private def tilesFor(hd: Jpeg2000.MainHeader, d: Int,
        xoff: Int, yoff: Int, w: Int, h: Int): Seq[Int] = {
      def red(n: Int): Int = Jpeg2000Dims.lowLen(n, d)
      for {
        ty <- 0 until hd.nty
        tx <- 0 until hd.ntx
        rx0 = (tx * hd.tw) >> d
        ry0 = (ty * hd.th) >> d
        rw = red(math.min(hd.tw, hd.w - tx * hd.tw))
        rh = red(math.min(hd.th, hd.h - ty * hd.th))
        if rx0 < xoff + w && xoff < rx0 + rw && ry0 < yoff + h && yoff < ry0 + rh
      } yield ty * hd.ntx + tx
    }

    /** Partial codestream: main header ++ the SELECTED tile-parts ++
      * EOC. With `discard > 0` each tile-part is truncated to its PLT
      * prefix (leading packets only) and its Psot patched to match.
      * None when the stream carries no TLM or a peek falls short —
      * callers fall back to bigger fetches. */
    private def stitch(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        head: Array[Byte], hd: Jpeg2000.MainHeader,
        needed: Seq[Int], discard: Int): Option[Array[Byte]] = {
      if (hd.firstSot > head.length) return None
      val ranges = Jpeg2000.tileRangesFromTlm(head).getOrElse(return None)
      if (needed.exists(ti => ti >= ranges.length || ranges(ti).isEmpty))
        return None
      val out = new java.io.ByteArrayOutputStream()
      // main header with TLM STRIPPED: the original TLM describes the
      // FULL stream's tile-part offsets/lengths, which are meaningless in
      // a stitched stream — a consumer re-windowing the stitched output
      // through tileRangesFromTlm would read garbage ranges. Internal
      // decode ignores TLM, so dropping it loses nothing.
      val bbH = java.nio.ByteBuffer.wrap(head).order(java.nio.ByteOrder.BIG_ENDIAN)
      out.write(head, 0, hd.csOff + 2)
      var hp = hd.csOff + 2
      while (hp < hd.firstSot) {
        val segLen = 2 + (bbH.getShort(hp + 2) & 0xFFFF)
        if ((bbH.getShort(hp) & 0xFFFF) != 0xFF55) out.write(head, hp, segLen)
        hp += segLen
      }
      needed.foreach { ti =>
        if (discard == 0) {
          ranges(ti).foreach { case (off, len) =>
            if (off + len > fileLen) return None
            out.write(fetch(off, len))
          }
        } else {
          // leading packets of resolutions 0..nl-discard, accumulated
          // ACROSS the tile's parts (a per-resolution multi-part layout
          // contributes whole leading parts, then a PLT prefix of the
          // boundary part)
          var remaining = Jpeg2000.neededPackets(hd, ti, discard)
            .getOrElse(return None)
          val it = ranges(ti).iterator
          while (remaining > 0) {
            if (!it.hasNext) return None // parts exhausted before covered
            val (off, len) = it.next()
            if (off + len > fileLen) return None
            val peek = fetch(off, math.min(len, TilePeek))
            val (sodAt, lens) = Jpeg2000.partPacketLens(peek)
              .getOrElse(return None)
            if (lens.length <= remaining) {
              // whole part needed (equality included: trailing part bytes
              // past the listed packets would be unreachable anyway)
              out.write(if (peek.length >= len) peek
                else peek ++ fetch(off + peek.length, len - peek.length))
              remaining -= lens.length
            } else {
              val pre = sodAt + lens.take(remaining).sum
              val part =
                if (pre <= peek.length) java.util.Arrays.copyOfRange(peek, 0, pre)
                else peek ++ fetch(off + peek.length, pre - peek.length)
              // patch Psot to the truncated length so the decoder's tile
              // directory steps to the next stitched part correctly
              part(6) = (pre >>> 24).toByte
              part(7) = (pre >>> 16).toByte
              part(8) = (pre >>> 8).toByte
              part(9) = pre.toByte
              out.write(part)
              remaining = 0
            }
          }
        }
      }
      out.write(0xFF); out.write(0xD9) // EOC
      Some(out.toByteArray)
    }

    private def layoutOf(head: Array[Byte]): Option[Jpeg2000.MainHeader] =
      try Some(Jpeg2000.layout(head)) catch { case _: Exception => None }

    /** Windowed read: a TILED stream fetches only the intersecting
      * tile-parts (TLM byte ranges); a single-tile stream fetches whole
      * (code-block ranges are only known after walking packet headers).
      * Either way the ENTROPY decode — the dominant cost — runs only
      * for the code-blocks inside the window's wavelet pyramid
      * (Jpeg2000.decodeWindow's selective EBCOT). */
    override def loadWindow(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        xoff: Int, yoff: Int, w: Int, h: Int): Raster = {
      require(fileLen <= Int.MaxValue, "jp2 loader: file too large")
      val head = fetch(0L, math.min(fileLen, HeaderProbe.toLong).toInt)
      val bytes = layoutOf(head).filter(_.multiTile)
        .flatMap(hd => stitch(fetch, fileLen, head, hd,
          tilesFor(hd, 0, xoff, yoff, w, h), 0))
        .getOrElse(if (fileLen <= head.length) head
          else head ++ fetch(head.length.toLong, (fileLen - head.length).toInt))
      val planes = Jpeg2000.decodeWindow(bytes, xoff, yoff, w, h)
      val (crs, gt0) = geoOf(head).getOrElse(
        ("", Array(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)))
      val gt = gt0.clone()
      gt(0) = gt0(0) + xoff * gt0(1) + yoff * gt0(2)
      gt(3) = gt0(3) + xoff * gt0(4) + yoff * gt0(5)
      // a subsampled component's window plane is its ceil-division image
      // of the canvas window — replication-upsample it onto the window
      // grid with the window-origin phase
      val ss = ssTable(head)
      val bands = planes.zipWithIndex.map { case (p, c) =>
        val (sx, sy) = ss(c)
        Band(Double.NaN,
          RasterModel.packDoubles(upsample(p, sx, sy, w, h, xoff, yoff)),
          ptype = typeName(p.depth, p.signed))
      }
      Raster(crs, gt, w, h, bands.toIndexedSeq)
    }

    override def overviews(fetch: (Long, Int) => Array[Byte],
        fileLen: Long): IndexedSeq[(Long, Int, Int)] = {
      val head = fetch(0L, math.min(fileLen, HeaderProbe.toLong).toInt)
      val (w, h, _, codNl) = Jpeg2000.info(head)
      // a COC level override caps the usable overview depth at the
      // SHALLOWEST component pyramid
      val nl = (try Some(Jpeg2000.layout(head)) catch {
        case _: Exception => None
      }).map(hd => (0 until hd.nc).map(hd.nlOf).min).getOrElse(codNl)
      (1 to nl).map { d =>
        (d.toLong, Jpeg2000Dims.lowLen(w, d), Jpeg2000Dims.lowLen(h, d))
      }.toIndexedSeq
    }

    override def loadWindowAt(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        level: Long, xoff: Int, yoff: Int, w: Int, h: Int,
        baseGt: Array[Double], baseCrs: String): Raster = {
      require(fileLen <= Int.MaxValue, "jp2 loader: file too large")
      // a reduced-resolution decode consumes only the leading packets:
      // the PLT gives the exact prefix. Tiled streams fetch a per-tile
      // prefix for just the tiles the window intersects; single-tile
      // streams fetch the single global prefix.
      val head = fetch(0L, math.min(fileLen, HeaderProbe.toLong).toInt)
      val d = level.toInt
      layoutOf(head).filter(_.multiTile)
        .flatMap(hd => stitch(fetch, fileLen, head, hd,
          tilesFor(hd, d, xoff, yoff, w, h), d)) match {
        case Some(st) =>
          val planes = Jpeg2000.decodeWindowAt(st, d, xoff, yoff, w, h)
          val bands = planes.map { p =>
            val vals = new Array[Double](p.samples.length)
            var i = 0
            while (i < vals.length) { vals(i) = p.samples(i).toDouble; i += 1 }
            Band(Double.NaN, RasterModel.packDoubles(vals),
              ptype = typeName(p.depth, p.signed))
          }
          Raster(baseCrs, {
            val g = baseGt.clone()
            g(0) = baseGt(0) + xoff * baseGt(1) + yoff * baseGt(2)
            g(3) = baseGt(3) + xoff * baseGt(4) + yoff * baseGt(5)
            g
          }, w, h, bands.toIndexedSeq)
        case None =>
          val n = Jpeg2000.prefixLenFor(head, d)
            .map(p => math.min(p.toLong, fileLen)).getOrElse(fileLen)
          val bytes =
            if (n <= head.length) head
            else head ++ fetch(head.length.toLong, (n - head.length).toInt)
          val full = readAt(bytes, d)
          val cropped = RasterLoaders.crop(full, xoff, yoff, w, h)
          cropped.copy(crs = baseCrs, gt = {
            val g = baseGt.clone()
            g(0) = baseGt(0) + xoff * baseGt(1) + yoff * baseGt(2)
            g(3) = baseGt(3) + xoff * baseGt(4) + yoff * baseGt(5)
            g
          })
      }
    }
  }

  /** lowLen re-export for overview dimension math. */
  private[sources] object Jpeg2000Dims {
    def lowLen(n: Int, l: Int): Int = {
      var v = n
      var i = 0
      while (i < l) { v = (v + 1) / 2; i += 1 }
      v
    }
  }

  private def geoOf(bytes: Array[Byte]): Option[(String, Array[Double])] = {
    if (bytes.length < 12 || bytes(4) != 'j'.toByte || bytes(5) != 'P'.toByte)
      return None // raw codestream: no boxes
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 0
    while (pos + 8 <= bytes.length) {
      var len = bb.getInt(pos).toLong
      val boxType = new String(bytes, pos + 4, 4, "ISO-8859-1")
      var dataOff = pos + 8
      if (len == 1) { len = bb.getLong(pos + 8); dataOff = pos + 16 }
      else if (len == 0) len = bytes.length - pos
      if (boxType == "uuid" && (pos + len).toInt - dataOff > 16 &&
          java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + 16),
            GeoJp2Uuid)) {
        val tiff = java.util.Arrays.copyOfRange(bytes, dataOff + 16, (pos + len).toInt)
        val g = GeoTiff.read(tiff)
        return Some((g.crs, g.gt))
      }
      pos += len.toInt
    }
    None
  }
}
