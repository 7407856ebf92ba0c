package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** LASzip (LAZ) decoder for the chunked *layered* compression scheme
  * ("compressor 3") that LAS 1.4 point formats 6-10 use — the format the
  * reference reads through the `laz` crate
  * (rust/sedona-pointcloud/Cargo.toml:51-53, paired tests/data fixtures).
  *
  * Implemented from the published LAZ 1.4 specification
  * (https://downloads.rapidlasso.de/doc/LAZ_Specification_1.4_R1.pdf,
  * linked from the fixture generator tests/data/generate.py): an
  * adaptive arithmetic coder of the Amir Said FastAC family, per-field
  * layer streams, and integer correctors with exponent-bucket models.
  * Validated bit-for-bit against the reference's paired fixtures
  * (extra.las/extra.laz, large.las/large.laz — see LasSpec).
  *
  * Scope notes:
  *  - POINT14 (item 10, v3/v4 layered) + RGB14 (item 11) / RGBNIR14
  *    (item 12) + BYTE14 (item 14, extra bytes) — point formats 6/7/8.
  *    Pointwise compressors 1/2 cover legacy formats 0-3 (see below);
  *    WAVEPACKET items (formats 4/5/9/10) are not handled.
  *  - The return-number/number-of-returns context tables
  *    (`returnMap6`/`returnLevel8`) are reconstructed as |n-r| distance
  *    maps clamped to 6/8 slots, not copied from the spec's published
  *    16x16 tables (the spec PDF and the laszip/laz-rs sources are not
  *    present in this zero-egress build environment, and both reference
  *    fixtures are constant-pattern — there is nothing offline to
  *    transcribe or validate the published tables against, and a
  *    half-remembered table would be strictly worse than this documented
  *    deterministic one). Slot choice must match the *encoder's* tables,
  *    so: files written by this engine decode exactly — LasSpec proves
  *    bit-exact roundtrips on fuzzed 16x16 (n,r) streams and a directed
  *    multi-return pulse train whose pattern changes mid-stream — and
  *    constant-pattern external files (single-return LiDAR, both
  *    reference fixtures) decode exactly too, but an externally-encoded
  *    file whose points vary across multi-return patterns may silently
  *    mis-predict X/Y/Z after the first pattern change. Swap in the
  *    published tables before trusting external multi-return LAZ.
  *  - Decode is sequential per file; the chunk table (present at the
  *    i64 offset heading the point data) would allow per-chunk splits
  *    at scale — file-level parallelism is the current split unit,
  *    matching LasIO's one-task-per-file model.
  */
private[graft] object Laszip {

  // ---------------------------------------------------------------------
  // laszip VLR ("laszip encoded", record id 22204)
  // ---------------------------------------------------------------------

  final case class Item(itemType: Int, size: Int, version: Int)
  final case class LazVlr(compressor: Int, chunkSize: Int, items: Seq[Item]) {
    def point14: Option[Item] = items.find(_.itemType == 10)
    def rgb14: Option[Item] = items.find(_.itemType == 11)
    def rgbNir14: Option[Item] = items.find(_.itemType == 12)
    def byte14: Option[Item] = items.find(_.itemType == 14)
    /** Wire bytes of the RGB(+NIR) block: 6 (fmt 7), 8 (fmt 8), 0 (fmt 6). */
    def rgbBytes: Int =
      if (rgbNir14.isDefined) 8 else if (rgb14.isDefined) 6 else 0
  }

  def parseVlr(payload: Array[Byte]): LazVlr = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val compressor = bb.getShort(0) & 0xffff
    val chunkSize = bb.getInt(12)
    val nItems = bb.getShort(32) & 0xffff
    val items = (0 until nItems).map { i =>
      Item(bb.getShort(34 + 6 * i) & 0xffff, bb.getShort(36 + 6 * i) & 0xffff,
        bb.getShort(38 + 6 * i) & 0xffff)
    }
    LazVlr(compressor, chunkSize, items)
  }

  // ---------------------------------------------------------------------
  // Arithmetic decoder (FastAC family). 32-bit unsigned state kept in
  // Longs; products dist*length fit 32 bits by construction (dist < 2^15,
  // length>>15 < 2^17).
  // ---------------------------------------------------------------------

  private val AcMin = 0x01000000L
  private val AcMax = 0xFFFFFFFFL
  private val DmShift = 15
  private val DmMax = 1 << DmShift
  private val BmShift = 13
  private val BmMax = 1 << BmShift
  private val M32 = 0xFFFFFFFFL

  final class ArDecoder(buf: Array[Byte], start: Int, end: Int) {
    var p: Int = start
    var value: Long = 0L
    var length: Long = AcMax
    locally {
      var i = 0
      while (i < 4) { value = ((value << 8) | nextByte()) & M32; i += 1 }
    }

    @inline private def nextByte(): Long =
      if (p < end) { val v = buf(p) & 0xffL; p += 1; v } else 0L

    def consumed: Int = p - start

    @inline private def renorm(): Unit = {
      do {
        value = ((value << 8) | nextByte()) & M32
        length = (length << 8) & M32
      } while (length < AcMin)
    }

    def decodeBit(m: BitModel): Int = {
      val x = m.bit0Prob * (length >>> BmShift)
      val sym = if (value < x) 0 else 1
      if (sym == 0) { length = x; m.bit0Count += 1 }
      else { value -= x; length -= x }
      if (length < AcMin) renorm()
      m.bitsUntilUpdate -= 1
      if (m.bitsUntilUpdate == 0) m.update()
      sym
    }

    def decodeSymbol(m: SymModel): Int = {
      var x = 0L
      var y = length
      var sym = 0
      if (m.table != null) {
        length >>>= DmShift
        val dv = value / length
        val t = (dv >>> m.tableShift).toInt
        sym = m.table(t)
        var n = m.table(t + 1) + 1
        while (n > sym + 1) {
          val k = (sym + n) >>> 1
          if (m.dist(k) > dv) n = k else sym = k
        }
        x = m.dist(sym) * length
        if (sym != m.symbols - 1) y = m.dist(sym + 1) * length
      } else {
        length >>>= DmShift
        var n = m.symbols
        var k = n >>> 1
        var done = false
        while (!done) {
          val z = length * m.dist(k)
          if (z > value) { n = k; y = z } else { sym = k; x = z }
          k = (sym + n) >>> 1
          if (k == sym) done = true
        }
      }
      value -= x
      length = y - x
      if (length < AcMin) renorm()
      m.count(sym) += 1
      m.symbolsUntilUpdate -= 1
      if (m.symbolsUntilUpdate == 0) m.update()
      sym
    }

    def readBits(bits: Int): Long = {
      if (bits > 19) {
        val tmp = readShort()
        (readBits(bits - 16) << 16) | tmp
      } else {
        length >>>= bits
        val sym = value / length
        value -= sym * length
        if (length < AcMin) renorm()
        sym
      }
    }

    def readShort(): Long = {
      length >>>= 16
      val sym = value / length
      value -= sym * length
      if (length < AcMin) renorm()
      sym
    }

    def readInt(): Long = readBits(32)
  }

  /** Adaptive binary model: probability of bit 0, rescaled on a growing
    * update cycle capped at 64. */
  final class BitModel {
    var bit0Count = 1L
    var bitCount = 2L
    var bit0Prob: Long = 1L << (BmShift - 1)
    var updateCycle = 4
    var bitsUntilUpdate = 4

    def update(): Unit = {
      bitCount += updateCycle
      if (bitCount > BmMax) {
        bitCount = (bitCount + 1) >> 1
        bit0Count = (bit0Count + 1) >> 1
        if (bit0Count == bitCount) bitCount += 1
      }
      bit0Prob = (bit0Count << BmShift) / bitCount
      updateCycle = (5 * updateCycle) >> 2
      if (updateCycle > 64) updateCycle = 64
      bitsUntilUpdate = updateCycle
    }
  }

  /** Adaptive multi-symbol model with cumulative distribution and, for
    * alphabets over 16 symbols, a decode acceleration table. */
  final class SymModel(val symbols: Int) {
    val dist = new Array[Long](symbols)
    val count = new Array[Long](symbols)
    java.util.Arrays.fill(count, 1L)
    var tableShift = 0
    val table: Array[Int] =
      if (symbols > 16) {
        var tableBits = 3
        while (symbols > (1 << (tableBits + 2))) tableBits += 1
        tableShift = DmShift - tableBits
        new Array[Int]((1 << tableBits) + 2)
      } else null
    private def tableSize = if (table == null) 0 else table.length - 2
    var totalCount = 0L
    var updateCycle = symbols
    var symbolsUntilUpdate = 0
    update()
    updateCycle = (symbols + 6) >> 1
    symbolsUntilUpdate = updateCycle

    def update(): Unit = {
      totalCount += updateCycle
      if (totalCount > DmMax) {
        totalCount = 0
        var k = 0
        while (k < symbols) {
          count(k) = (count(k) + 1) >> 1; totalCount += count(k); k += 1
        }
      }
      val scale = 0x80000000L / totalCount
      var sum = 0L
      if (table == null) {
        var k = 0
        while (k < symbols) {
          dist(k) = (scale * sum) >> (31 - DmShift); sum += count(k); k += 1
        }
      } else {
        var s = 0
        var k = 0
        while (k < symbols) {
          dist(k) = (scale * sum) >> (31 - DmShift)
          sum += count(k)
          val w = (dist(k) >> tableShift).toInt
          while (s < w) { s += 1; table(s) = k - 1 }
          k += 1
        }
        table(0) = 0
        while (s <= tableSize) { s += 1; table(s) = symbols - 1 }
      }
      updateCycle = (5 * updateCycle) >> 2
      val maxCycle = (symbols + 6) << 3
      if (updateCycle > maxCycle) updateCycle = maxCycle
      symbolsUntilUpdate = updateCycle
    }
  }

  /** Integer decompressor: exponent k from a per-context model, then k
    * significant bits (low bits raw past 8), folded into a signed
    * corrector added to the prediction. */
  final class IntDec(dec: ArDecoder, bits: Int, contexts: Int) {
    private val bitsHigh = 8
    private val corrBits = if (bits > 0 && bits < 32) bits else 32
    private val corrRange = if (bits > 0 && bits < 32) 1L << bits else 0L
    private val corrMin: Long = if (corrRange > 0) -(corrRange >> 1) else Int.MinValue.toLong
    private val corrMax: Long = if (corrRange > 0) corrMin + corrRange - 1 else Int.MaxValue.toLong
    private val mBits = Array.fill(contexts)(new SymModel(corrBits + 1))
    private val mCorr0 = new BitModel
    // exponents run 1..corrBits inclusive (k == corrBits is legal for
    // sub-32-bit compressors, e.g. intensity corrector -32768)
    private val mCorr: Array[SymModel] = {
      val a = new Array[SymModel](corrBits + 1)
      var k = 1
      while (k <= corrBits) { a(k) = new SymModel(1 << math.min(k, bitsHigh)); k += 1 }
      a
    }
    /** Exponent of the last corrector (laszip getK) — feeds the Y/Z
      * context selection. */
    var k = 0

    def decompress(pred: Int, context: Int): Int = {
      k = dec.decodeSymbol(mBits(context))
      var real = pred.toLong + readCorrector()
      if (real < corrMin) real += corrRange
      else if (real > corrMax) real -= corrRange
      real.toInt
    }

    private def readCorrector(): Long = {
      if (k == 0) return dec.decodeBit(mCorr0).toLong
      if (k >= 32) return corrMin
      var c: Long =
        if (k <= bitsHigh) dec.decodeSymbol(mCorr(k)).toLong
        else {
          val k1 = k - bitsHigh
          (dec.decodeSymbol(mCorr(k)).toLong << k1) | dec.readBits(k1)
        }
      if (c >= (1L << (k - 1))) c += 1
      else c -= (1L << k) - 1
      c
    }
  }

  /** Streaming median of the last five values (laszip's X/Y delta
    * predictor): alternating high/low insertion keeps the middle slot
    * the running median. */
  final class Median5 {
    private val v = new Array[Int](5)
    private var high = true
    def get: Int = v(2)
    def add(x: Int): Unit = {
      if (high) {
        if (x < v(2)) {
          v(4) = v(3); v(3) = v(2)
          if (x < v(0)) { v(2) = v(1); v(1) = v(0); v(0) = x }
          else if (x < v(1)) { v(2) = v(1); v(1) = x }
          else v(2) = x
        } else {
          if (x < v(3)) { v(4) = v(3); v(3) = x } else v(4) = x
          high = false
        }
      } else {
        if (v(2) < x) {
          v(0) = v(1); v(1) = v(2)
          if (v(4) < x) { v(2) = v(3); v(3) = v(4); v(4) = x }
          else if (v(3) < x) { v(2) = v(3); v(3) = x }
          else v(2) = x
        } else {
          if (v(1) < x) { v(0) = v(1); v(1) = x } else v(0) = x
          high = true
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // POINT14 v3 per-coder-channel context state
  // ---------------------------------------------------------------------

  /** Return-count context maps: distance |n-r| folded into 6 (X/Y
    * median slots) and 8 (Z predictor slots) buckets. Slot choice only
    * has to be a stable function of (n, r) within one stream. */
  private def returnMap6(n: Int, r: Int): Int = math.min(math.abs(n - r), 5)
  private def returnLevel8(n: Int, r: Int): Int = math.min(math.abs(n - r), 7)

  private val GpsMulti = 500
  private val GpsMultiMinus = -10
  private val GpsMultiUnchanged = GpsMulti - GpsMultiMinus + 1 // 511
  private val GpsMultiCodeFull = GpsMulti - GpsMultiMinus + 2 // 512
  private val GpsMultiTotal = GpsMulti - GpsMultiMinus + 6 // 516

  /** All mutable decode state for one scanner-channel context. Models
    * are created eagerly (cheap) except the 64/16-slot conditional
    * arrays, which allocate on first use. */
  private final class Ctx(
      decXY: ArDecoder, decZ: ArDecoder, decCls: ArDecoder, decFlags: ArDecoder,
      decInt: ArDecoder, decSa: ArDecoder, decUd: ArDecoder, decPs: ArDecoder,
      decGps: ArDecoder, nExtra: Int, rgbBytes: Int = 0) {
    var unused = true
    // last point fields (wire semantics)
    var x, y, z = 0
    var intensity = 0
    var retNum, numRet = 0
    var classFlags, scannerCh, scanDir, edge = 0
    var classification, userData = 0
    var scanAngle = 0 // i16
    var pointSource = 0
    var gpsBits = 0L // f64 bit pattern, compressed as i64
    var gpsTimeChange = false
    // RGB/NIR (formats 7/8): the RGB12 byte-diff scheme per context,
    // NIR its two-model analog; wire bytes sit between POINT14 and extras
    val rgb = new Array[Int](3)
    var nir = 0
    val rgbState: Rgb12 = if (rgbBytes > 0) new Rgb12 else null
    val nirState: Nir14 = if (rgbBytes == 8) new Nir14 else null
    val extra = new Array[Int](nExtra)

    val mChanged: Array[SymModel] = Array.fill(8)(new SymModel(128))
    val mScannerChannel = new SymModel(3)
    val mNumReturns: Array[SymModel] = new Array(16)
    val mReturnNumber: Array[SymModel] = new Array(16)
    val mReturnNumberGpsSame = new SymModel(13)
    val icDx = if (decXY != null) new IntDec(decXY, 32, 2) else null
    val icDy = if (decXY != null) new IntDec(decXY, 32, 22) else null
    val icZ = if (decZ != null) new IntDec(decZ, 32, 20) else null
    val mClassification: Array[SymModel] = new Array(64)
    val mFlags: Array[SymModel] = new Array(64)
    val mUserData: Array[SymModel] = new Array(64)
    val icIntensity = if (decInt != null) new IntDec(decInt, 16, 4) else null
    val icScanAngle = if (decSa != null) new IntDec(decSa, 16, 2) else null
    val icPointSource = if (decPs != null) new IntDec(decPs, 16, 1) else null
    val mGpsMulti = new SymModel(GpsMultiTotal)
    val mGps0Diff = new SymModel(6)
    val icGps = if (decGps != null) new IntDec(decGps, 32, 9) else null
    val medX: Array[Median5] = Array.fill(12)(new Median5)
    val medY: Array[Median5] = Array.fill(12)(new Median5)
    val lastZ = new Array[Int](8)
    val lastIntensity = new Array[Int](8)
    // gps sequence cache
    var gpsLast, gpsNext = 0
    val lastGps = new Array[Long](4)
    val lastGpsDiff = new Array[Int](4)
    val multiExtreme = new Array[Int](4)
    val mExtra: Array[SymModel] = new Array(nExtra)

    /** Seed the context from a raw point record (chunk start or scanner
      * channel first-seen). */
    def init(rec: Array[Byte], recOff: Int): Unit = {
      val bb = ByteBuffer.wrap(rec, recOff, rec.length - recOff).order(ByteOrder.LITTLE_ENDIAN)
      x = bb.getInt(recOff); y = bb.getInt(recOff + 4); z = bb.getInt(recOff + 8)
      intensity = bb.getShort(recOff + 12) & 0xffff
      val rb = rec(recOff + 14) & 0xff
      retNum = rb & 0x0f; numRet = (rb >> 4) & 0x0f
      val fb = rec(recOff + 15) & 0xff
      classFlags = fb & 0x0f; scannerCh = (fb >> 4) & 0x03
      scanDir = (fb >> 6) & 0x01; edge = (fb >> 7) & 0x01
      classification = rec(recOff + 16) & 0xff
      userData = rec(recOff + 17) & 0xff
      scanAngle = bb.getShort(recOff + 18).toInt
      pointSource = bb.getShort(recOff + 20) & 0xffff
      gpsBits = bb.getLong(recOff + 22)
      gpsTimeChange = false
      if (rgbBytes > 0) {
        rgb(0) = bb.getShort(recOff + 30) & 0xffff
        rgb(1) = bb.getShort(recOff + 32) & 0xffff
        rgb(2) = bb.getShort(recOff + 34) & 0xffff
        rgbState.init(rgb(0), rgb(1), rgb(2))
        if (rgbBytes == 8) {
          nir = bb.getShort(recOff + 36) & 0xffff
          nirState.init(nir)
        }
      }
      var i = 0
      while (i < extra.length) { extra(i) = rec(recOff + 30 + rgbBytes + i) & 0xff; i += 1 }
      java.util.Arrays.fill(lastZ, z)
      java.util.Arrays.fill(lastIntensity, intensity)
      gpsLast = 0; gpsNext = 0
      java.util.Arrays.fill(lastGps, 0L); lastGps(0) = gpsBits
      java.util.Arrays.fill(lastGpsDiff, 0)
      java.util.Arrays.fill(multiExtreme, 0)
      unused = false
    }

    def writeRecord(out: Array[Byte], off: Int): Unit = {
      val bb = ByteBuffer.wrap(out, off, out.length - off).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(off, x); bb.putInt(off + 4, y); bb.putInt(off + 8, z)
      bb.putShort(off + 12, intensity.toShort)
      out(off + 14) = ((retNum & 0x0f) | ((numRet & 0x0f) << 4)).toByte
      out(off + 15) = ((classFlags & 0x0f) | ((scannerCh & 0x03) << 4) |
        ((scanDir & 0x01) << 6) | ((edge & 0x01) << 7)).toByte
      out(off + 16) = classification.toByte
      out(off + 17) = userData.toByte
      bb.putShort(off + 18, scanAngle.toShort)
      bb.putShort(off + 20, pointSource.toShort)
      bb.putLong(off + 22, gpsBits)
      if (rgbBytes > 0) {
        bb.putShort(off + 30, rgb(0).toShort)
        bb.putShort(off + 32, rgb(1).toShort)
        bb.putShort(off + 34, rgb(2).toShort)
        if (rgbBytes == 8) bb.putShort(off + 36, nir.toShort)
      }
      var i = 0
      while (i < extra.length) { out(off + 30 + rgbBytes + i) = extra(i).toByte; i += 1 }
    }
  }

  // ---------------------------------------------------------------------
  // Chunk decode
  // ---------------------------------------------------------------------

  /** Decode every point of a layered LAZ point-data stream into raw
    * POINT14(+extra) records of `recLen` bytes. `bytes` is the whole
    * file, `pointOff` the header's offset-to-point-data. */
  def decode(bytes: Array[Byte], pointOff: Int, total: Long, vlr: LazVlr,
      recLen: Int): Iterator[Array[Byte]] = {
    require(vlr.compressor == 3,
      s"LAZ compressor ${vlr.compressor} not supported (chunked layered [3] only)")
    val p14 = vlr.point14.getOrElse(
      throw new IllegalArgumentException("LAZ stream without POINT14 item"))
    require(p14.version == 3 || p14.version == 4, s"POINT14 v${p14.version} not supported")
    (vlr.rgb14 orElse vlr.rgbNir14).foreach(it => require(
      it.version == 3 || it.version == 4, s"RGB14 v${it.version} not supported"))
    val rgbBytes = vlr.rgbBytes
    val nExtra = vlr.byte14.map(_.size).getOrElse(0)
    require(recLen == 30 + rgbBytes + nExtra,
      s"record length $recLen != 30 + $rgbBytes rgb + $nExtra extra bytes")
    // i64 chunk table offset heads the point data; chunks follow densely.
    var p = pointOff + 8
    var remaining = total

    new Iterator[Array[Byte]] {
      private var chunkPts: Iterator[Array[Byte]] = Iterator.empty
      def hasNext: Boolean = chunkPts.hasNext || remaining > 0
      def next(): Array[Byte] = {
        if (!chunkPts.hasNext) {
          val (pts, nextP) = decodeChunk(bytes, p, remaining, nExtra, recLen, rgbBytes)
          chunkPts = pts.iterator
          remaining -= pts.length
          p = nextP
        }
        chunkPts.next()
      }
    }
  }

  /** Decode the chunk table at the end of the point data: the i64 at
    * `pointOff` locates [u32 version][u32 nChunks][IC-coded byte size
    * per chunk] (sizes predicted by the previous chunk's size). Returns
    * (absolute chunk start, chunk byte length) pairs — the random-access
    * index that makes chunks, not files, the parallel split unit. */
  def chunkTable(bytes: Array[Byte], pointOff: Int): Option[Array[(Long, Int)]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val cto = bb.getLong(pointOff)
    if (cto <= pointOff || cto > bytes.length - 8) return None
    chunkSizes(java.util.Arrays.copyOfRange(bytes, cto.toInt, bytes.length))
      .map(offsetsFromSizes(_, pointOff + 8L))
  }

  /** Chunk byte sizes from the raw table bytes ([u32 version][u32
    * n][coded sizes]); usable on a seek-read tail slice. */
  def chunkSizes(table: Array[Byte]): Option[Array[Int]] = {
    if (table.length < 8) return None
    val bb = ByteBuffer.wrap(table).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt(4)
    if (n <= 0 || n > (1 << 26)) return None
    val dec = new ArDecoder(table, 8, table.length)
    val ic = new IntDec(dec, 32, 2)
    val out = new Array[Int](n)
    var prev = 0
    var i = 0
    while (i < n) {
      out(i) = ic.decompress(prev, 1)
      if (out(i) <= 0) return None
      prev = out(i)
      i += 1
    }
    Some(out)
  }

  def offsetsFromSizes(sizes: Array[Int], first: Long): Array[(Long, Int)] = {
    val out = new Array[(Long, Int)](sizes.length)
    var off = first
    var i = 0
    while (i < sizes.length) { out(i) = (off, sizes(i)); off += sizes(i); i += 1 }
    out
  }

  /** Decode a single chunk handed its own byte slice (for chunk-split
    * parallel reads): returns up to `expect` records. */
  def decodeChunkRecords(chunk: Array[Byte], expect: Long, nExtra: Int,
      recLen: Int, rgbBytes: Int = 0): Array[Array[Byte]] =
    decodeChunk(chunk, 0, expect, nExtra, recLen, rgbBytes)._1

  /** Legacy (pointwise compressor 2) analog of [[decodeChunkRecords]]:
    * decode one pointwise chunk from its own byte slice. Each chunk
    * restarts the coder with a raw first point, so a seek-read slice
    * decodes independently — chunks, not files, are the split unit. */
  def decodePointwiseChunkRecords(chunk: Array[Byte], expect: Long,
      vlr: LazVlr, recLen: Int): Array[Array[Byte]] = {
    val (gps, rgb, nExtra) = legacyLayout(vlr.items)
    decodePointwiseChunk(chunk, 0, expect, gps, rgb, nExtra, recLen)
  }

  /** One chunk: [raw first point][u32 count][9 + rgbLayers + nExtra u32
    * layer sizes][layer bytes...]; returns the records and the offset
    * just past the chunk. RGB14 contributes one layer, RGBNIR14 two
    * (RGB then NIR), each between the POINT14 nine and the extras. */
  private def decodeChunk(bytes: Array[Byte], chunkOff: Int, remaining: Long,
      nExtra: Int, recLen: Int, rgbBytes: Int = 0): (Array[Array[Byte]], Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var p = chunkOff
    val raw = java.util.Arrays.copyOfRange(bytes, p, p + recLen)
    p += recLen
    val count = math.min(bb.getInt(p).toLong & 0xffffffffL, remaining).toInt
    p += 4
    val rgbLayers = rgbBytes match { case 8 => 2; case 6 => 1; case _ => 0 }
    val nLayers = 9 + rgbLayers + nExtra
    val sizes = new Array[Int](nLayers)
    var i = 0
    while (i < nLayers) { sizes(i) = bb.getInt(p); p += 4; i += 1 }
    val dataStart = p
    val offs = new Array[Int](nLayers)
    var acc = dataStart
    i = 0
    while (i < nLayers) { offs(i) = acc; acc += sizes(i); i += 1 }

    @inline def dec(i: Int): ArDecoder =
      if (sizes(i) > 0) new ArDecoder(bytes, offs(i), offs(i) + sizes(i)) else null
    val decXY = dec(0); val decZ = dec(1); val decCls = dec(2); val decFlags = dec(3)
    val decInt = dec(4); val decSa = dec(5); val decUd = dec(6); val decPs = dec(7)
    val decGps = dec(8)
    val decRgb = if (rgbLayers >= 1) dec(9) else null
    val decNir = if (rgbLayers == 2) dec(10) else null
    val decExtra = Array.tabulate(nExtra)(j => dec(9 + rgbLayers + j))

    val ctxs = Array.fill(4)(new Ctx(decXY, decZ, decCls, decFlags, decInt,
      decSa, decUd, decPs, decGps, nExtra, rgbBytes))
    var cur = (raw(15) >> 4) & 0x03 // scanner channel of the raw first point
    ctxs(cur).init(raw, 0)

    val out = new Array[Array[Byte]](count)
    out(0) = raw
    var n = 1
    while (n < count) {
      var l = ctxs(cur)
      // context from the previous point's return role + gps continuity
      val lpr = (if (l.retNum == 1) 1 else 0) + (if (l.retNum >= l.numRet) 2 else 0) +
        (if (l.gpsTimeChange) 4 else 0)
      val cv = decXY.decodeSymbol(l.mChanged(lpr))

      if ((cv & (1 << 6)) != 0) { // scanner channel switch
        val diff = decXY.decodeSymbol(l.mScannerChannel)
        val sc = (cur + diff + 1) % 4
        if (ctxs(sc).unused) {
          val seed = new Array[Byte](recLen)
          l.writeRecord(seed, 0)
          ctxs(sc).init(seed, 0)
        }
        cur = sc
        l = ctxs(cur)
        l.scannerCh = sc
      }
      val pointSourceChange = (cv & (1 << 5)) != 0
      val gpsTimeChange = (cv & (1 << 4)) != 0
      val scanAngleChange = (cv & (1 << 3)) != 0

      val lastN = l.numRet
      val lastR = l.retNum
      val nr =
        if ((cv & (1 << 2)) != 0) {
          if (l.mNumReturns(lastN) == null) l.mNumReturns(lastN) = new SymModel(16)
          decXY.decodeSymbol(l.mNumReturns(lastN))
        } else lastN
      val r = (cv & 3) match {
        case 0 => lastR
        case 1 => (lastR + 1) % 16
        case 2 => (lastR + 15) % 16
        case _ =>
          if (gpsTimeChange) {
            if (l.mReturnNumber(lastR) == null) l.mReturnNumber(lastR) = new SymModel(16)
            decXY.decodeSymbol(l.mReturnNumber(lastR))
          } else {
            val sym = decXY.decodeSymbol(l.mReturnNumberGpsSame)
            (lastR + sym + 2) % 16
          }
      }
      l.retNum = r
      l.numRet = nr

      val m = returnMap6(nr, r)
      val lev = returnLevel8(nr, r)
      // current point's return role: single(3)/first(2)/last(1)/mid(0)
      val cpr = (if (r == 1) 2 else 0) + (if (r >= nr) 1 else 0)
      val g = if (gpsTimeChange) 1 else 0

      // X/Y deltas off the streaming median predictor; Z off the
      // per-return-level last value.
      val mxi = (m << 1) | g
      var median = l.medX(mxi).get
      var diff = l.icDx.decompress(median, if (nr == 1) 1 else 0)
      l.x += diff
      l.medX(mxi).add(diff)

      var kBits = l.icDx.k
      median = l.medY(mxi).get
      diff = l.icDy.decompress(median,
        (if (nr == 1) 1 else 0) + (if (kBits < 20) kBits & ~1 else 20))
      l.y += diff
      l.medY(mxi).add(diff)

      if (decZ != null) {
        kBits = (l.icDx.k + l.icDy.k) / 2
        l.z = l.icZ.decompress(l.lastZ(lev),
          (if (nr == 1) 1 else 0) + (if (kBits < 18) kBits & ~1 else 18))
        l.lastZ(lev) = l.z
      }

      if (decCls != null) {
        val ccc = ((l.classification & 0x1f) << 1) + (if (cpr == 3) 1 else 0)
        if (l.mClassification(ccc) == null) l.mClassification(ccc) = new SymModel(256)
        l.classification = decCls.decodeSymbol(l.mClassification(ccc))
      }
      if (decFlags != null) {
        val lastFlags = (l.edge << 5) | (l.scanDir << 4) | l.classFlags
        if (l.mFlags(lastFlags) == null) l.mFlags(lastFlags) = new SymModel(64)
        val f = decFlags.decodeSymbol(l.mFlags(lastFlags))
        l.classFlags = f & 0x0f
        l.scanDir = (f >> 4) & 1
        l.edge = (f >> 5) & 1
      }
      if (decInt != null) {
        val ii = (cpr << 1) | g
        l.intensity = l.icIntensity.decompress(l.lastIntensity(ii), cpr) & 0xffff
        l.lastIntensity(ii) = l.intensity
      }
      if (decSa != null && scanAngleChange) {
        l.scanAngle = l.icScanAngle.decompress(l.scanAngle, g) // signed i16 domain
      }
      if (decUd != null) {
        val ui = l.userData / 4
        if (l.mUserData(ui) == null) l.mUserData(ui) = new SymModel(256)
        l.userData = decUd.decodeSymbol(l.mUserData(ui))
      }
      if (decPs != null && pointSourceChange) {
        l.pointSource = l.icPointSource.decompress(l.pointSource, 0) & 0xffff
      }
      if (decGps != null && gpsTimeChange) readGpsTime(l, decGps)
      l.gpsTimeChange = gpsTimeChange
      if (gpsTimeChange && decGps != null) l.gpsBits = l.lastGps(l.gpsLast)

      if (decRgb != null) {
        val c = l.rgbState.read(decRgb)
        l.rgb(0) = c(0); l.rgb(1) = c(1); l.rgb(2) = c(2)
      }
      if (decNir != null) l.nir = l.nirState.read(decNir)

      var j = 0
      while (j < nExtra) {
        if (decExtra(j) != null) {
          if (l.mExtra(j) == null) l.mExtra(j) = new SymModel(256)
          l.extra(j) = (l.extra(j) + decExtra(j).decodeSymbol(l.mExtra(j))) & 0xff
        }
        j += 1
      }

      val rec = new Array[Byte](recLen)
      l.writeRecord(rec, 0)
      out(n) = rec
      n += 1
    }
    (out, acc)
  }

  // ---------------------------------------------------------------------
  // Encoder (mirror of the decoder; shares SymModel/BitModel evolution)
  // ---------------------------------------------------------------------

  final class ArEncoder {
    private var buf = new Array[Byte](1 << 10)
    private var n = 0
    var base: Long = 0L
    var length: Long = AcMax

    @inline private def emit(b: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(n) = b.toByte
      n += 1
    }

    private def propagateCarry(): Unit = {
      var i = n - 1
      while (i >= 0 && buf(i) == 0xFF.toByte) { buf(i) = 0; i -= 1 }
      require(i >= 0, "carry past start of arithmetic stream")
      buf(i) = (buf(i) + 1).toByte
    }

    @inline private def renorm(): Unit = {
      do {
        emit(((base >>> 24) & 0xFF).toInt)
        base = (base << 8) & M32
      } while ({ length = (length << 8) & M32; length < AcMin })
    }

    def encodeBit(m: BitModel, sym: Int): Unit = {
      val x = m.bit0Prob * (length >>> BmShift)
      if (sym == 0) { length = x; m.bit0Count += 1 }
      else {
        val init = base
        base = (base + x) & M32
        if (base < init) propagateCarry()
        length -= x
      }
      if (length < AcMin) renorm()
      m.bitsUntilUpdate -= 1
      if (m.bitsUntilUpdate == 0) m.update()
    }

    def encodeSymbol(m: SymModel, sym: Int): Unit = {
      val init = base
      if (sym == m.symbols - 1) {
        val x = m.dist(sym) * (length >>> DmShift)
        base = (base + x) & M32
        length -= x
      } else {
        length >>>= DmShift
        val x = m.dist(sym) * length
        base = (base + x) & M32
        length = m.dist(sym + 1) * length - x
      }
      if (base < init) propagateCarry()
      if (length < AcMin) renorm()
      m.count(sym) += 1
      m.symbolsUntilUpdate -= 1
      if (m.symbolsUntilUpdate == 0) m.update()
    }

    def writeBits(bits: Int, sym: Long): Unit = {
      if (bits > 19) {
        writeShort(sym & 0xFFFF)
        writeBits(bits - 16, sym >>> 16)
      } else {
        val init = base
        length >>>= bits
        base = (base + sym * length) & M32
        if (base < init) propagateCarry()
        if (length < AcMin) renorm()
      }
    }

    def writeShort(sym: Long): Unit = {
      val init = base
      length >>>= 16
      base = (base + sym * length) & M32
      if (base < init) propagateCarry()
      if (length < AcMin) renorm()
    }

    def writeInt(sym: Long): Unit = { writeShort(sym & 0xFFFF); writeShort(sym >>> 16) }

    def hasOutput: Boolean = n > 0 || base != 0L

    /** Flush and return the stream bytes (zero-padded so any decoder
      * prefetching up to 4 bytes past the logical end reads zeros). */
    def done(): Array[Byte] = {
      val init = base
      if (length > 2 * AcMin) { base = (base + AcMin) & M32; length = AcMin >>> 1 }
      else { base = (base + (AcMin >>> 1)) & M32; length = AcMin >>> 9 }
      if (base < init) propagateCarry()
      renorm()
      emit(0); emit(0); emit(0)
      java.util.Arrays.copyOf(buf, n)
    }
  }

  /** Integer compressor, compress side — model layout identical to
    * [[IntDec]] so encoder/decoder states evolve in lockstep. */
  final class IntEnc(enc: ArEncoder, bits: Int, contexts: Int) {
    private val bitsHigh = 8
    private val corrBits = if (bits > 0 && bits < 32) bits else 32
    private val corrRange = if (bits > 0 && bits < 32) 1L << bits else 0L
    private val corrMin: Long = if (corrRange > 0) -(corrRange >> 1) else Int.MinValue.toLong
    private val corrMax: Long = if (corrRange > 0) corrMin + corrRange - 1 else Int.MaxValue.toLong
    private val mBits = Array.fill(contexts)(new SymModel(corrBits + 1))
    private val mCorr0 = new BitModel
    // exponents run 1..corrBits inclusive — mirror of IntDec
    private val mCorr: Array[SymModel] = {
      val a = new Array[SymModel](corrBits + 1)
      var k = 1
      while (k <= corrBits) { a(k) = new SymModel(1 << math.min(k, bitsHigh)); k += 1 }
      a
    }
    var k = 0

    def compress(pred: Int, real: Int, context: Int): Unit = {
      var corr = real.toLong - pred.toLong
      if (corrRange > 0) {
        if (corr < corrMin) corr += corrRange
        else if (corr > corrMax) corr -= corrRange
      } else corr = (real - pred).toLong // natural i32 wrap
      writeCorrector(corr, context)
    }

    private def writeCorrector(c: Long, context: Int): Unit = {
      if (c == 0 || c == 1) {
        k = 0
        enc.encodeSymbol(mBits(context), 0)
        enc.encodeBit(mCorr0, c.toInt)
        return
      }
      var cRaw = 0L
      if (c > 1) { // corrector in [2^(k-1)+1 .. 2^k]
        k = 64 - java.lang.Long.numberOfLeadingZeros(c - 1)
        cRaw = c - 1
      } else { // corrector in [-(2^k - 1) .. -2^(k-1)]
        k = 64 - java.lang.Long.numberOfLeadingZeros(-c)
        cRaw = c + (1L << k) - 1
      }
      if (k >= 32) {
        k = 32
        enc.encodeSymbol(mBits(context), 32)
        return
      }
      enc.encodeSymbol(mBits(context), k)
      if (k <= bitsHigh) enc.encodeSymbol(mCorr(k), cRaw.toInt)
      else {
        val k1 = k - bitsHigh
        enc.encodeSymbol(mCorr(k), (cRaw >>> k1).toInt)
        enc.writeBits(k1, cRaw & ((1L << k1) - 1))
      }
    }
  }

  /** Encode point records into a layered LAZ point-data stream (the
    * bytes that follow the header): [i64 chunk-table offset][chunks...]
    * [chunk table]. Mirror of [[decode]]; every produced stream decodes
    * bit-exact under it (LasSpec fuzz roundtrips). */
  def encode(records: Iterator[Array[Byte]], recLen: Int, nExtra: Int,
      chunkSize: Int, pointOff: Long = 0L, rgbBytes: Int = 0): Array[Byte] = {
    val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val group = new scala.collection.mutable.ArrayBuffer[Array[Byte]](chunkSize)
    def flush(): Unit = if (group.nonEmpty) {
      chunks += encodeChunk(group.toArray, nExtra, recLen, rgbBytes)
      group.clear()
    }
    records.foreach { r =>
      group += r
      if (group.length == chunkSize) flush()
    }
    flush()
    val dataLen = chunks.map(_.length.toLong).sum
    // chunk table: u32 version, u32 n, IC-coded sizes predicted by the
    // previous size
    val tenc = new ArEncoder
    val tic = new IntEnc(tenc, 32, 2)
    var prev = 0
    chunks.foreach { c => tic.compress(prev, c.length, 1); prev = c.length }
    val table = if (chunks.nonEmpty) tenc.done() else Array.emptyByteArray
    val out = ByteBuffer.allocate((8 + dataLen + 8 + table.length).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(pointOff + 8 + dataLen) // absolute file offset of the chunk table
    chunks.foreach(out.put)
    out.putInt(0) // table version
    out.putInt(chunks.length)
    out.put(table)
    out.array()
  }

  /** Plain field view of a wire record (reused per point; no models). */
  private final class PtFields(nExtra: Int, rgbBytes: Int = 0) {
    var x, y, z, intensity, retNum, numRet, classFlags, scannerCh, scanDir,
      edge, classification, userData, scanAngle, pointSource = 0
    var gpsBits = 0L
    val rgb = new Array[Int](3)
    var nir = 0
    val extra = new Array[Int](nExtra)
    def load(rec: Array[Byte]): Unit = {
      val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
      x = bb.getInt(0); y = bb.getInt(4); z = bb.getInt(8)
      intensity = bb.getShort(12) & 0xffff
      val rb = rec(14) & 0xff
      retNum = rb & 0x0f; numRet = (rb >> 4) & 0x0f
      val fb = rec(15) & 0xff
      classFlags = fb & 0x0f; scannerCh = (fb >> 4) & 0x03
      scanDir = (fb >> 6) & 0x01; edge = (fb >> 7) & 0x01
      classification = rec(16) & 0xff
      userData = rec(17) & 0xff
      scanAngle = bb.getShort(18).toInt
      pointSource = bb.getShort(20) & 0xffff
      gpsBits = bb.getLong(22)
      if (rgbBytes > 0) {
        rgb(0) = bb.getShort(30) & 0xffff
        rgb(1) = bb.getShort(32) & 0xffff
        rgb(2) = bb.getShort(34) & 0xffff
        if (rgbBytes == 8) nir = bb.getShort(36) & 0xffff
      }
      var i = 0
      while (i < extra.length) { extra(i) = rec(30 + rgbBytes + i) & 0xff; i += 1 }
    }
  }

  /** Encoder-side state: the shared per-context models live in [[Ctx]]
    * (with null layer decoders); integer compressors attach here. The
    * per-field logic is the line-by-line mirror of the decode loop. */
  private final class EncCtxSet(encXY: ArEncoder, encZ: ArEncoder, encCls: ArEncoder,
      encFlags: ArEncoder, encInt: ArEncoder, encSa: ArEncoder, encUd: ArEncoder,
      encPs: ArEncoder, encGps: ArEncoder, encRgb: ArEncoder, encNir: ArEncoder,
      encExtra: Array[ArEncoder], nExtra: Int, rgbBytes: Int) {
    val ctx: Array[Ctx] = Array.fill(4)(new Ctx(null, null, null, null, null,
      null, null, null, null, nExtra, rgbBytes))
    private val icDx = Array.fill(4)(new IntEnc(encXY, 32, 2))
    private val icDy = Array.fill(4)(new IntEnc(encXY, 32, 22))
    private val icZ = Array.fill(4)(new IntEnc(encZ, 32, 20))
    private val icIntensity = Array.fill(4)(new IntEnc(encInt, 16, 4))
    private val icScanAngle = Array.fill(4)(new IntEnc(encSa, 16, 2))
    private val icPointSource = Array.fill(4)(new IntEnc(encPs, 16, 1))
    private val icGps = Array.fill(4)(new IntEnc(encGps, 32, 9))
    val changed = new Array[Boolean](7) // cls, flags, int, sa, ud, ps, gps
    var changedRgb, changedNir = false
    val changedExtra = new Array[Boolean](nExtra)

    /** Encode one point; returns the (possibly switched) context id. */
    def encodePoint(cur0: Int, p: PtFields): Int = {
      var cur = cur0
      var l = ctx(cur)
      val lpr = (if (l.retNum == 1) 1 else 0) + (if (l.retNum >= l.numRet) 2 else 0) +
        (if (l.gpsTimeChange) 4 else 0)
      val scChange = p.scannerCh != cur
      // diffs are taken against the target context's last point (seeded
      // from the current one when first used) — mirror of the decoder's
      // post-switch baseline
      val baseline =
        if (scChange && ctx(p.scannerCh).unused) l else if (scChange) ctx(p.scannerCh) else l
      val psChange = p.pointSource != baseline.pointSource
      val gpsChange = p.gpsBits != baseline.gpsBits
      val saChange = p.scanAngle != baseline.scanAngle
      val nrChange = p.numRet != baseline.numRet
      val rdiff = (p.retNum - baseline.retNum + 16) % 16
      val rcase = rdiff match { case 0 => 0; case 1 => 1; case 15 => 2; case _ => 3 }
      val cv = (if (scChange) 1 << 6 else 0) | (if (psChange) 1 << 5 else 0) |
        (if (gpsChange) 1 << 4 else 0) | (if (saChange) 1 << 3 else 0) |
        (if (nrChange) 1 << 2 else 0) | rcase
      encXY.encodeSymbol(l.mChanged(lpr), cv)

      if (scChange) {
        encXY.encodeSymbol(l.mScannerChannel, (p.scannerCh - cur - 1 + 4) % 4)
        if (ctx(p.scannerCh).unused) {
          val seed = new Array[Byte](30 + rgbBytes + nExtra)
          l.writeRecord(seed, 0)
          ctx(p.scannerCh).init(seed, 0)
        }
        cur = p.scannerCh
        l = ctx(cur)
        l.scannerCh = cur
      }

      if (nrChange) {
        if (l.mNumReturns(l.numRet) == null) l.mNumReturns(l.numRet) = new SymModel(16)
        encXY.encodeSymbol(l.mNumReturns(l.numRet), p.numRet)
      }
      if (rcase == 3) {
        if (gpsChange) {
          if (l.mReturnNumber(l.retNum) == null) l.mReturnNumber(l.retNum) = new SymModel(16)
          encXY.encodeSymbol(l.mReturnNumber(l.retNum), p.retNum)
        } else encXY.encodeSymbol(l.mReturnNumberGpsSame, rdiff - 2)
      }
      l.retNum = p.retNum
      l.numRet = p.numRet

      val m = returnMap6(p.numRet, p.retNum)
      val lev = returnLevel8(p.numRet, p.retNum)
      val cpr = (if (p.retNum == 1) 2 else 0) + (if (p.retNum >= p.numRet) 1 else 0)
      val g = if (gpsChange) 1 else 0
      val mxi = (m << 1) | g

      val dx = p.x - l.x
      icDx(cur).compress(l.medX(mxi).get, dx, if (p.numRet == 1) 1 else 0)
      l.x = p.x
      l.medX(mxi).add(dx)
      var kBits = icDx(cur).k
      val dy = p.y - l.y
      icDy(cur).compress(l.medY(mxi).get, dy,
        (if (p.numRet == 1) 1 else 0) + (if (kBits < 20) kBits & ~1 else 20))
      l.y = p.y
      l.medY(mxi).add(dy)
      kBits = (icDx(cur).k + icDy(cur).k) / 2
      icZ(cur).compress(l.lastZ(lev), p.z,
        (if (p.numRet == 1) 1 else 0) + (if (kBits < 18) kBits & ~1 else 18))
      l.lastZ(lev) = p.z
      l.z = p.z

      val ccc = ((l.classification & 0x1f) << 1) + (if (cpr == 3) 1 else 0)
      if (l.mClassification(ccc) == null) l.mClassification(ccc) = new SymModel(256)
      changed(0) |= p.classification != l.classification
      encCls.encodeSymbol(l.mClassification(ccc), p.classification)
      l.classification = p.classification

      val lastFlags = (l.edge << 5) | (l.scanDir << 4) | l.classFlags
      val newFlags = (p.edge << 5) | (p.scanDir << 4) | p.classFlags
      if (l.mFlags(lastFlags) == null) l.mFlags(lastFlags) = new SymModel(64)
      changed(1) |= newFlags != lastFlags
      encFlags.encodeSymbol(l.mFlags(lastFlags), newFlags)
      l.classFlags = p.classFlags; l.scanDir = p.scanDir; l.edge = p.edge

      val ii = (cpr << 1) | g
      changed(2) |= p.intensity != l.intensity
      icIntensity(cur).compress(l.lastIntensity(ii), p.intensity, cpr)
      l.lastIntensity(ii) = p.intensity
      l.intensity = p.intensity

      if (saChange) {
        changed(3) = true
        icScanAngle(cur).compress(l.scanAngle, p.scanAngle, g)
        l.scanAngle = p.scanAngle
      }

      val ui = l.userData / 4
      if (l.mUserData(ui) == null) l.mUserData(ui) = new SymModel(256)
      changed(4) |= p.userData != l.userData
      encUd.encodeSymbol(l.mUserData(ui), p.userData)
      l.userData = p.userData

      if (psChange) {
        changed(5) = true
        icPointSource(cur).compress(l.pointSource, p.pointSource, 0)
        l.pointSource = p.pointSource
      }

      if (gpsChange) {
        changed(6) = true
        writeGpsTime(l, cur, p.gpsBits)
      }
      l.gpsTimeChange = gpsChange
      l.gpsBits = p.gpsBits

      if (rgbBytes > 0) {
        changedRgb |= p.rgb(0) != l.rgb(0) || p.rgb(1) != l.rgb(1) ||
          p.rgb(2) != l.rgb(2)
        l.rgbState.write(encRgb, p.rgb(0), p.rgb(1), p.rgb(2))
        l.rgb(0) = p.rgb(0); l.rgb(1) = p.rgb(1); l.rgb(2) = p.rgb(2)
        if (rgbBytes == 8) {
          changedNir |= p.nir != l.nir
          l.nirState.write(encNir, p.nir)
          l.nir = p.nir
        }
      }

      var j = 0
      while (j < nExtra) {
        val d = (p.extra(j) - l.extra(j)) & 0xff
        if (l.mExtra(j) == null) l.mExtra(j) = new SymModel(256)
        changedExtra(j) |= d != 0
        encExtra(j).encodeSymbol(l.mExtra(j), d)
        l.extra(j) = p.extra(j)
        j += 1
      }
      cur
    }

    /** Mirror of [[readGpsTime]] restricted to the codes {0diff 0/1/2,
      * multi 1/UNCHANGED/CODE_FULL} — every emitted code decodes to the
      * exact input under the full decoder state machine. */
    private def writeGpsTime(l: Ctx, cur: Int, gps: Long): Unit = {
      val d64 = gps - l.lastGps(l.gpsLast)
      if (l.lastGpsDiff(l.gpsLast) == 0) {
        if (d64 == 0) encGps.encodeSymbol(l.mGps0Diff, 0)
        else if (d64 == d64.toInt.toLong) {
          encGps.encodeSymbol(l.mGps0Diff, 1)
          icGps(cur).compress(0, d64.toInt, 0)
          l.lastGpsDiff(l.gpsLast) = d64.toInt
          l.lastGps(l.gpsLast) += d64
          l.multiExtreme(l.gpsLast) = 0
        } else {
          encGps.encodeSymbol(l.mGps0Diff, 2)
          fullGps(l, cur, gps)
        }
      } else {
        if (d64 == 0) encGps.encodeSymbol(l.mGpsMulti, GpsMultiUnchanged)
        else if (d64 == d64.toInt.toLong) {
          encGps.encodeSymbol(l.mGpsMulti, 1)
          icGps(cur).compress(l.lastGpsDiff(l.gpsLast), d64.toInt, 1)
          l.lastGps(l.gpsLast) += d64
          l.multiExtreme(l.gpsLast) = 0
        } else {
          encGps.encodeSymbol(l.mGpsMulti, GpsMultiCodeFull)
          fullGps(l, cur, gps)
        }
      }
    }

    private def fullGps(l: Ctx, cur: Int, gps: Long): Unit = {
      l.gpsNext = (l.gpsNext + 1) & 3
      icGps(cur).compress((l.lastGps(l.gpsLast) >>> 32).toInt, (gps >>> 32).toInt, 8)
      encGps.writeInt(gps & M32)
      l.lastGps(l.gpsNext) = gps
      l.gpsLast = l.gpsNext
      l.lastGpsDiff(l.gpsLast) = 0
      l.multiExtreme(l.gpsLast) = 0
    }
  }

  /** One chunk: raw first point, u32 count, layer sizes, layers.
    * Conditional layers (classification/flags/intensity/scan-angle/
    * user-data/point-source/gps/extra) are dropped when the field never
    * changed in the chunk — the decoder then holds the first point's
    * value, exactly as the layered format specifies. */
  private[sources] def encodeChunk(recs: Array[Array[Byte]], nExtra: Int, recLen: Int,
      rgbBytes: Int = 0): Array[Byte] = {
    val encXY = new ArEncoder; val encZ = new ArEncoder; val encCls = new ArEncoder
    val encFlags = new ArEncoder; val encInt = new ArEncoder; val encSa = new ArEncoder
    val encUd = new ArEncoder; val encPs = new ArEncoder; val encGps = new ArEncoder
    val encRgb = if (rgbBytes > 0) new ArEncoder else null
    val encNir = if (rgbBytes == 8) new ArEncoder else null
    val encExtra = Array.fill(nExtra)(new ArEncoder)
    val st = new EncCtxSet(encXY, encZ, encCls, encFlags, encInt, encSa, encUd,
      encPs, encGps, encRgb, encNir, encExtra, nExtra, rgbBytes)

    val raw = recs(0)
    var cur = (raw(15) >> 4) & 0x03
    st.ctx(cur).init(raw, 0)
    val p = new PtFields(nExtra, rgbBytes)
    var n = 1
    while (n < recs.length) {
      p.load(recs(n))
      cur = st.encodePoint(cur, p)
      n += 1
    }

    def layer(e: ArEncoder, changed: Boolean): Array[Byte] =
      if (changed) e.done() else Array.emptyByteArray
    val multi = recs.length > 1
    val layers: Array[Array[Byte]] =
      (Array(layer(encXY, multi), layer(encZ, multi),
        layer(encCls, st.changed(0)), layer(encFlags, st.changed(1)),
        layer(encInt, st.changed(2)), layer(encSa, st.changed(3)),
        layer(encUd, st.changed(4)), layer(encPs, st.changed(5)),
        layer(encGps, st.changed(6))) ++
        (if (rgbBytes > 0) Array(layer(encRgb, st.changedRgb))
         else Array.empty[Array[Byte]]) ++
        (if (rgbBytes == 8) Array(layer(encNir, st.changedNir))
         else Array.empty[Array[Byte]])) ++
        encExtra.indices.map(j => layer(encExtra(j), st.changedExtra(j)))

    val total = recLen + 4 + 4 * layers.length + layers.map(_.length).sum
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.put(raw)
    out.putInt(recs.length)
    layers.foreach(l => out.putInt(l.length))
    layers.foreach(out.put)
    out.array()
  }

  /** GPS time sequence decoder (the GpsTime11 scheme with a 4-slot
    * sequence cache; deltas are coded on the f64 *bit pattern* as i64).
    * Exercised only when a chunk's gps layer is present. */
  private def readGpsTime(l: Ctx, dec: ArDecoder): Unit = {
    if (l.lastGpsDiff(l.gpsLast) == 0) {
      val multi = dec.decodeSymbol(l.mGps0Diff)
      if (multi == 1) { // difference fits 32 bits
        l.lastGpsDiff(l.gpsLast) = l.icGps.decompress(0, 0)
        l.lastGps(l.gpsLast) += l.lastGpsDiff(l.gpsLast)
        l.multiExtreme(l.gpsLast) = 0
      } else if (multi == 2) { // full 64-bit jump, start new sequence
        l.gpsNext = (l.gpsNext + 1) & 3
        val hi = l.icGps.decompress((l.lastGps(l.gpsLast) >>> 32).toInt, 8)
        l.lastGps(l.gpsNext) = ((hi.toLong & M32) << 32) | dec.readInt()
        l.gpsLast = l.gpsNext
        l.lastGpsDiff(l.gpsLast) = 0
        l.multiExtreme(l.gpsLast) = 0
      } else if (multi > 2) { // switch to another cached sequence
        l.gpsLast = (l.gpsLast + multi - 2) & 3
        readGpsTime(l, dec)
      }
      // multi == 0: unchanged
    } else {
      val multi = dec.decodeSymbol(l.mGpsMulti)
      if (multi == 1) {
        l.lastGps(l.gpsLast) += l.icGps.decompress(l.lastGpsDiff(l.gpsLast), 1)
        l.multiExtreme(l.gpsLast) = 0
      } else if (multi < GpsMultiUnchanged) {
        var gpsDiff = 0
        if (multi == 0) {
          gpsDiff = l.icGps.decompress(0, 7)
          l.multiExtreme(l.gpsLast) += 1
          if (l.multiExtreme(l.gpsLast) > 3) {
            l.lastGpsDiff(l.gpsLast) = gpsDiff
            l.multiExtreme(l.gpsLast) = 0
          }
        } else if (multi < GpsMulti) {
          val ctx = if (multi < 10) 2 else 3
          gpsDiff = l.icGps.decompress(multi * l.lastGpsDiff(l.gpsLast), ctx)
        } else if (multi == GpsMulti) {
          gpsDiff = l.icGps.decompress(GpsMulti * l.lastGpsDiff(l.gpsLast), 4)
          l.multiExtreme(l.gpsLast) += 1
          if (l.multiExtreme(l.gpsLast) > 3) {
            l.lastGpsDiff(l.gpsLast) = gpsDiff
            l.multiExtreme(l.gpsLast) = 0
          }
        } else { // negative multipliers 501..510 → -1..-10
          val neg = GpsMulti - multi
          if (neg > GpsMultiMinus) {
            gpsDiff = l.icGps.decompress(neg * l.lastGpsDiff(l.gpsLast), 5)
          } else {
            gpsDiff = l.icGps.decompress(GpsMultiMinus * l.lastGpsDiff(l.gpsLast), 6)
            l.multiExtreme(l.gpsLast) += 1
            if (l.multiExtreme(l.gpsLast) > 3) {
              l.lastGpsDiff(l.gpsLast) = gpsDiff
              l.multiExtreme(l.gpsLast) = 0
            }
          }
        }
        l.lastGps(l.gpsLast) += gpsDiff
      } else if (multi == GpsMultiUnchanged) {
        () // unchanged
      } else if (multi == GpsMultiCodeFull) {
        l.gpsNext = (l.gpsNext + 1) & 3
        val hi = l.icGps.decompress((l.lastGps(l.gpsLast) >>> 32).toInt, 8)
        l.lastGps(l.gpsNext) = ((hi.toLong & M32) << 32) | dec.readInt()
        l.gpsLast = l.gpsNext
        l.lastGpsDiff(l.gpsLast) = 0
        l.multiExtreme(l.gpsLast) = 0
      } else { // switch sequence
        l.gpsLast = (l.gpsLast + multi - GpsMultiCodeFull) & 3
        readGpsTime(l, dec)
      }
    }
  }

  // ---------------------------------------------------------------------
  // Pointwise compressors 1/2 — legacy LAS point formats 0-3
  // (POINT10 + GPSTIME11 + RGB12 + BYTE, item versions 2). All items
  // share ONE arithmetic coder per chunk, records interleaved per point
  // — the pre-1.4 scheme every legacy LiDAR archive uses. Implemented
  // from the published LAZ specification's v2 item descriptions; same
  // self-consistency caveat as the 16x16 return tables above (no legacy
  // fixture exists offline to cross-check byte-exactness against
  // laszip.exe, encoder+decoder are roundtrip-proven in LasSpec).
  // ---------------------------------------------------------------------

  /** The classic 8x8 number_return_map of the LAZ spec (16 X/Y median
    * context slots keyed by (number_of_returns, return_number)). */
  private val NrMap8: Array[Array[Int]] = Array(
    Array(15, 14, 13, 12, 11, 10, 9, 8),
    Array(14, 0, 1, 3, 6, 10, 10, 9),
    Array(13, 1, 2, 4, 7, 11, 11, 10),
    Array(12, 3, 4, 5, 8, 12, 12, 11),
    Array(11, 6, 7, 8, 9, 13, 13, 12),
    Array(10, 10, 11, 12, 13, 14, 14, 13),
    Array(9, 10, 11, 12, 13, 14, 15, 14),
    Array(8, 9, 10, 11, 12, 13, 14, 15))
  /** number_return_level: |n - r| (8 Z predictor slots). */
  @inline private def nrLevel8(n: Int, r: Int): Int = math.abs(n - r)

  @inline private def u8Fold(v: Int): Int = v & 0xff
  @inline private def u8Clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Lazily-created per-value 256-symbol model table (laszip pattern for
    * bitbyte/classification/user-data conditioning on the last value). */
  private final class LazyModels {
    private val m = new Array[SymModel](256)
    def apply(i: Int): SymModel = {
      if (m(i) == null) m(i) = new SymModel(256)
      m(i)
    }
  }

  /** GPSTIME11 v2 state (identical scheme to the v3 gps layer: 4-slot
    * sequence cache, deltas on the f64 bit pattern as i64). */
  private final class Gps11 {
    val mGpsMulti = new SymModel(GpsMultiTotal)
    val mGps0Diff = new SymModel(6)
    var icGps: IntDec = null
    var icGpsEnc: IntEnc = null
    val lastGps = new Array[Long](4)
    val lastGpsDiff = new Array[Int](4)
    val multiExtreme = new Array[Int](4)
    var gpsLast = 0
    var gpsNext = 0

    def init(bits: Long): Unit = {
      java.util.Arrays.fill(lastGps, 0L)
      java.util.Arrays.fill(lastGpsDiff, 0)
      java.util.Arrays.fill(multiExtreme, 0)
      gpsLast = 0; gpsNext = 0
      lastGps(0) = bits
    }

    def read(dec: ArDecoder): Long = {
      if (lastGpsDiff(gpsLast) == 0) {
        val multi = dec.decodeSymbol(mGps0Diff)
        if (multi == 1) {
          lastGpsDiff(gpsLast) = icGps.decompress(0, 0)
          lastGps(gpsLast) += lastGpsDiff(gpsLast)
          multiExtreme(gpsLast) = 0
        } else if (multi == 2) {
          gpsNext = (gpsNext + 1) & 3
          val hi = icGps.decompress((lastGps(gpsLast) >>> 32).toInt, 8)
          lastGps(gpsNext) = ((hi.toLong & M32) << 32) | dec.readInt()
          gpsLast = gpsNext
          lastGpsDiff(gpsLast) = 0
          multiExtreme(gpsLast) = 0
        } else if (multi > 2) {
          gpsLast = (gpsLast + multi - 2) & 3
          return read(dec)
        }
      } else {
        val multi = dec.decodeSymbol(mGpsMulti)
        if (multi == 1) {
          lastGps(gpsLast) += icGps.decompress(lastGpsDiff(gpsLast), 1)
          multiExtreme(gpsLast) = 0
        } else if (multi < GpsMultiUnchanged) {
          var gpsDiff = 0
          if (multi == 0) {
            gpsDiff = icGps.decompress(0, 7)
            multiExtreme(gpsLast) += 1
            if (multiExtreme(gpsLast) > 3) {
              lastGpsDiff(gpsLast) = gpsDiff; multiExtreme(gpsLast) = 0
            }
          } else if (multi < GpsMulti) {
            val ctx = if (multi < 10) 2 else 3
            gpsDiff = icGps.decompress(multi * lastGpsDiff(gpsLast), ctx)
          } else if (multi == GpsMulti) {
            gpsDiff = icGps.decompress(GpsMulti * lastGpsDiff(gpsLast), 4)
            multiExtreme(gpsLast) += 1
            if (multiExtreme(gpsLast) > 3) {
              lastGpsDiff(gpsLast) = gpsDiff; multiExtreme(gpsLast) = 0
            }
          } else {
            val neg = GpsMulti - multi
            if (neg > GpsMultiMinus) {
              gpsDiff = icGps.decompress(neg * lastGpsDiff(gpsLast), 5)
            } else {
              gpsDiff = icGps.decompress(GpsMultiMinus * lastGpsDiff(gpsLast), 6)
              multiExtreme(gpsLast) += 1
              if (multiExtreme(gpsLast) > 3) {
                lastGpsDiff(gpsLast) = gpsDiff; multiExtreme(gpsLast) = 0
              }
            }
          }
          lastGps(gpsLast) += gpsDiff
        } else if (multi == GpsMultiUnchanged) {
          // unchanged
        } else if (multi == GpsMultiCodeFull) {
          gpsNext = (gpsNext + 1) & 3
          val hi = icGps.decompress((lastGps(gpsLast) >>> 32).toInt, 8)
          lastGps(gpsNext) = ((hi.toLong & M32) << 32) | dec.readInt()
          gpsLast = gpsNext
          lastGpsDiff(gpsLast) = 0
          multiExtreme(gpsLast) = 0
        } else {
          gpsLast = (gpsLast + multi - GpsMultiCodeFull) & 3
          return read(dec)
        }
      }
      lastGps(gpsLast)
    }

    /** Simplified but decodable encoder (codes {0diff 0/1/2, multi
      * 1/unchanged/full} — same subset the v3 encoder uses). */
    def write(enc: ArEncoder, gps: Long): Unit = {
      val d64 = gps - lastGps(gpsLast)
      if (lastGpsDiff(gpsLast) == 0) {
        if (d64 == 0) enc.encodeSymbol(mGps0Diff, 0)
        else if (d64 == d64.toInt.toLong) {
          enc.encodeSymbol(mGps0Diff, 1)
          icGpsEnc.compress(0, d64.toInt, 0)
          lastGpsDiff(gpsLast) = d64.toInt
          lastGps(gpsLast) += d64
          multiExtreme(gpsLast) = 0
        } else {
          enc.encodeSymbol(mGps0Diff, 2)
          full(enc, gps)
        }
      } else {
        if (d64 == 0) enc.encodeSymbol(mGpsMulti, GpsMultiUnchanged)
        else if (d64 == d64.toInt.toLong) {
          enc.encodeSymbol(mGpsMulti, 1)
          icGpsEnc.compress(lastGpsDiff(gpsLast), d64.toInt, 1)
          lastGps(gpsLast) += d64
          multiExtreme(gpsLast) = 0
        } else {
          enc.encodeSymbol(mGpsMulti, GpsMultiCodeFull)
          full(enc, gps)
        }
      }
    }
    private def full(enc: ArEncoder, gps: Long): Unit = {
      gpsNext = (gpsNext + 1) & 3
      icGpsEnc.compress((lastGps(gpsLast) >>> 32).toInt, (gps >>> 32).toInt, 8)
      enc.writeInt(gps & M32)
      lastGps(gpsNext) = gps
      gpsLast = gpsNext
      lastGpsDiff(gpsLast) = 0
      multiExtreme(gpsLast) = 0
    }
  }

  /** RGB12 v2 state: 7-bit byte-used flags + six conditional 256-symbol
    * diff models with the red->green->blue difference propagation. */
  private final class Rgb12 {
    val mByteUsed = new SymModel(128)
    val mDiff: Array[SymModel] = Array.fill(6)(new SymModel(256))
    val last = new Array[Int](3) // u16 r, g, b

    def init(r: Int, g: Int, b: Int): Unit = { last(0) = r; last(1) = g; last(2) = b }

    def read(dec: ArDecoder): Array[Int] = {
      val out = new Array[Int](3)
      val sym = dec.decodeSymbol(mByteUsed)
      if ((sym & 1) != 0)
        out(0) = u8Fold(dec.decodeSymbol(mDiff(0)) + (last(0) & 0xff))
      else out(0) = last(0) & 0xff
      if ((sym & 2) != 0)
        out(0) |= u8Fold(dec.decodeSymbol(mDiff(1)) + (last(0) >> 8)) << 8
      else out(0) |= last(0) & 0xff00
      if ((sym & 64) != 0) {
        var diff = (out(0) & 0xff) - (last(0) & 0xff)
        if ((sym & 4) != 0)
          out(1) = u8Fold(dec.decodeSymbol(mDiff(2)) + u8Clamp(diff + (last(1) & 0xff)))
        else out(1) = last(1) & 0xff
        if ((sym & 16) != 0) {
          diff = (diff + ((out(1) & 0xff) - (last(1) & 0xff))) / 2
          out(2) = u8Fold(dec.decodeSymbol(mDiff(4)) + u8Clamp(diff + (last(2) & 0xff)))
        } else out(2) = last(2) & 0xff
        diff = (out(0) >> 8) - (last(0) >> 8)
        if ((sym & 8) != 0)
          out(1) |= u8Fold(dec.decodeSymbol(mDiff(3)) + u8Clamp(diff + (last(1) >> 8))) << 8
        else out(1) |= last(1) & 0xff00
        if ((sym & 32) != 0) {
          diff = (diff + ((out(1) >> 8) - (last(1) >> 8))) / 2
          out(2) |= u8Fold(dec.decodeSymbol(mDiff(5)) + u8Clamp(diff + (last(2) >> 8))) << 8
        } else out(2) |= last(2) & 0xff00
      } else { out(1) = out(0); out(2) = out(0) }
      last(0) = out(0); last(1) = out(1); last(2) = out(2)
      out
    }

    def write(enc: ArEncoder, r: Int, g: Int, b: Int): Unit = {
      var sym = 0
      if ((r & 0xff) != (last(0) & 0xff)) sym |= 1
      if ((r >> 8) != (last(0) >> 8)) sym |= 2
      val differ = g != r || b != r
      if (differ) {
        sym |= 64
        if ((g & 0xff) != (last(1) & 0xff)) sym |= 4
        if ((g >> 8) != (last(1) >> 8)) sym |= 8
        if ((b & 0xff) != (last(2) & 0xff)) sym |= 16
        if ((b >> 8) != (last(2) >> 8)) sym |= 32
      }
      enc.encodeSymbol(mByteUsed, sym)
      if ((sym & 1) != 0)
        enc.encodeSymbol(mDiff(0), u8Fold((r & 0xff) - (last(0) & 0xff)))
      if ((sym & 2) != 0)
        enc.encodeSymbol(mDiff(1), u8Fold((r >> 8) - (last(0) >> 8)))
      if ((sym & 64) != 0) {
        var diff = (r & 0xff) - (last(0) & 0xff)
        if ((sym & 4) != 0)
          enc.encodeSymbol(mDiff(2), u8Fold((g & 0xff) - u8Clamp(diff + (last(1) & 0xff))))
        if ((sym & 16) != 0) {
          diff = (diff + ((g & 0xff) - (last(1) & 0xff))) / 2
          enc.encodeSymbol(mDiff(4), u8Fold((b & 0xff) - u8Clamp(diff + (last(2) & 0xff))))
        }
        diff = (r >> 8) - (last(0) >> 8)
        if ((sym & 8) != 0)
          enc.encodeSymbol(mDiff(3), u8Fold((g >> 8) - u8Clamp(diff + (last(1) >> 8))))
        if ((sym & 32) != 0) {
          diff = (diff + ((g >> 8) - (last(1) >> 8))) / 2
          enc.encodeSymbol(mDiff(5), u8Fold((b >> 8) - u8Clamp(diff + (last(2) >> 8))))
        }
      }
      last(0) = r; last(1) = g; last(2) = b
    }
  }

  /** NIR14 state (format 8's near-infrared u16): the RGB12 byte-diff
    * scheme reduced to one channel — 2-bit byte-used flags + two
    * conditional 256-symbol diff models. */
  private final class Nir14 {
    val mByteUsed = new SymModel(4)
    val mDiff: Array[SymModel] = Array.fill(2)(new SymModel(256))
    var last = 0 // u16

    def init(v: Int): Unit = last = v

    def read(dec: ArDecoder): Int = {
      val sym = dec.decodeSymbol(mByteUsed)
      var v =
        if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(mDiff(0)) + (last & 0xff))
        else last & 0xff
      v |= (if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(mDiff(1)) + (last >> 8))
            else last >> 8) << 8
      last = v
      v
    }

    def write(enc: ArEncoder, v: Int): Unit = {
      var sym = 0
      if ((v & 0xff) != (last & 0xff)) sym |= 1
      if ((v >> 8) != (last >> 8)) sym |= 2
      enc.encodeSymbol(mByteUsed, sym)
      if ((sym & 1) != 0) enc.encodeSymbol(mDiff(0), u8Fold((v & 0xff) - (last & 0xff)))
      if ((sym & 2) != 0) enc.encodeSymbol(mDiff(1), u8Fold((v >> 8) - (last >> 8)))
      last = v
    }
  }

  /** POINT10 v2 state: the 20-byte legacy record. */
  private final class Point10(dec: ArDecoder, enc: ArEncoder) {
    val mChanged = new SymModel(64)
    val mScanAngle: Array[SymModel] = Array.fill(2)(new SymModel(256))
    val mBitByte = new LazyModels
    val mClassification = new LazyModels
    val mUserData = new LazyModels
    val icIntensity = if (dec != null) new IntDec(dec, 16, 4) else null
    val icPointSource = if (dec != null) new IntDec(dec, 16, 1) else null
    val icDx = if (dec != null) new IntDec(dec, 32, 2) else null
    val icDy = if (dec != null) new IntDec(dec, 32, 22) else null
    val icZ = if (dec != null) new IntDec(dec, 32, 20) else null
    val ieIntensity = if (enc != null) new IntEnc(enc, 16, 4) else null
    val iePointSource = if (enc != null) new IntEnc(enc, 16, 1) else null
    val ieDx = if (enc != null) new IntEnc(enc, 32, 2) else null
    val ieDy = if (enc != null) new IntEnc(enc, 32, 22) else null
    val ieZ = if (enc != null) new IntEnc(enc, 32, 20) else null
    val medX: Array[Median5] = Array.fill(16)(new Median5)
    val medY: Array[Median5] = Array.fill(16)(new Median5)
    val lastIntensity = new Array[Int](16)
    val lastHeight = new Array[Int](8)
    // last record fields
    var x, y, z = 0
    var intensity = 0
    var bitByte = 0
    var classification = 0
    var scanAngleRank = 0
    var userData = 0
    var pointSource = 0

    def init(rec: Array[Byte], off: Int): Unit = {
      val bb = ByteBuffer.wrap(rec, off, 20).order(ByteOrder.LITTLE_ENDIAN)
      x = bb.getInt(off); y = bb.getInt(off + 4); z = bb.getInt(off + 8)
      intensity = bb.getShort(off + 12) & 0xffff
      bitByte = rec(off + 14) & 0xff
      classification = rec(off + 15) & 0xff
      scanAngleRank = rec(off + 16) & 0xff
      userData = rec(off + 17) & 0xff
      pointSource = bb.getShort(off + 18) & 0xffff
    }

    def store(rec: Array[Byte], off: Int): Unit = {
      val bb = ByteBuffer.wrap(rec, off, 20).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(off, x); bb.putInt(off + 4, y); bb.putInt(off + 8, z)
      bb.putShort(off + 12, intensity.toShort)
      rec(off + 14) = bitByte.toByte
      rec(off + 15) = classification.toByte
      rec(off + 16) = scanAngleRank.toByte
      rec(off + 17) = userData.toByte
      bb.putShort(off + 18, pointSource.toShort)
    }

    def read(): Unit = {
      val changed = dec.decodeSymbol(mChanged)
      if ((changed & 32) != 0) bitByte = dec.decodeSymbol(mBitByte(bitByte))
      val r = bitByte & 7
      val n = (bitByte >> 3) & 7
      val m = NrMap8(n)(r)
      val lvl = nrLevel8(n, r)
      if ((changed & 16) != 0) {
        intensity = icIntensity.decompress(lastIntensity(m), math.min(m, 3))
        lastIntensity(m) = intensity
      } else intensity = lastIntensity(m)
      if ((changed & 8) != 0)
        classification = dec.decodeSymbol(mClassification(classification))
      if ((changed & 4) != 0)
        scanAngleRank = u8Fold(dec.decodeSymbol(mScanAngle((bitByte >> 6) & 1)) +
          scanAngleRank)
      if ((changed & 2) != 0) userData = dec.decodeSymbol(mUserData(userData))
      if ((changed & 1) != 0)
        pointSource = icPointSource.decompress(pointSource, 0)
      val single = if (n == 1) 1 else 0
      val dx = icDx.decompress(medX(m).get, single)
      medX(m).add(dx); x += dx
      val kx = icDx.k
      val dy = icDy.decompress(medY(m).get,
        single + (if (kx < 20) kx & ~1 else 20))
      medY(m).add(dy); y += dy
      val kxy = (icDx.k + icDy.k) / 2
      z = icZ.decompress(lastHeight(lvl),
        single + (if (kxy < 18) kxy & ~1 else 18))
      lastHeight(lvl) = z
    }

    def write(rec: Array[Byte], off: Int): Unit = {
      val bb = ByteBuffer.wrap(rec, off, 20).order(ByteOrder.LITTLE_ENDIAN)
      val nx = bb.getInt(off); val ny = bb.getInt(off + 4); val nz = bb.getInt(off + 8)
      val nIntensity = bb.getShort(off + 12) & 0xffff
      val nBitByte = rec(off + 14) & 0xff
      val nClassification = rec(off + 15) & 0xff
      val nScanAngle = rec(off + 16) & 0xff
      val nUserData = rec(off + 17) & 0xff
      val nPointSource = bb.getShort(off + 18) & 0xffff
      val r = nBitByte & 7
      val n = (nBitByte >> 3) & 7
      val m = NrMap8(n)(r)
      val lvl = nrLevel8(n, r)
      var changed = 0
      if (nBitByte != bitByte) changed |= 32
      if (nIntensity != lastIntensity(m)) changed |= 16
      if (nClassification != classification) changed |= 8
      if (nScanAngle != scanAngleRank) changed |= 4
      if (nUserData != userData) changed |= 2
      if (nPointSource != pointSource) changed |= 1
      enc.encodeSymbol(mChanged, changed)
      if ((changed & 32) != 0) {
        enc.encodeSymbol(mBitByte(bitByte), nBitByte)
        bitByte = nBitByte
      }
      if ((changed & 16) != 0) {
        ieIntensity.compress(lastIntensity(m), nIntensity, math.min(m, 3))
        lastIntensity(m) = nIntensity
      }
      intensity = nIntensity
      if ((changed & 8) != 0) {
        enc.encodeSymbol(mClassification(classification), nClassification)
        classification = nClassification
      }
      if ((changed & 4) != 0) {
        enc.encodeSymbol(mScanAngle((nBitByte >> 6) & 1),
          u8Fold(nScanAngle - scanAngleRank))
        scanAngleRank = nScanAngle
      }
      if ((changed & 2) != 0) {
        enc.encodeSymbol(mUserData(userData), nUserData)
        userData = nUserData
      }
      if ((changed & 1) != 0) {
        iePointSource.compress(pointSource, nPointSource, 0)
        pointSource = nPointSource
      }
      val single = if (n == 1) 1 else 0
      val dx = nx - x
      ieDx.compress(medX(m).get, dx, single)
      medX(m).add(dx); x = nx
      val kx = ieDx.k
      val dy = ny - y
      ieDy.compress(medY(m).get, dy, single + (if (kx < 20) kx & ~1 else 20))
      medY(m).add(dy); y = ny
      val kxy = (ieDx.k + ieDy.k) / 2
      ieZ.compress(lastHeight(lvl), nz, single + (if (kxy < 18) kxy & ~1 else 18))
      lastHeight(lvl) = nz
      z = nz
    }
  }

  /** Record layout of the legacy formats: POINT10 core + optional gps
    * f64 + optional RGB 3xu16 + trailing extra bytes. */
  private def legacyLayout(items: Seq[Item]): (Boolean, Boolean, Int) = {
    var gps = false; var rgb = false; var extra = 0
    items.foreach { it =>
      it.itemType match {
        case 6 => require(it.version == 2, s"POINT10 v${it.version} not supported (v2 only)")
        case 7 => require(it.version == 2, s"GPSTIME11 v${it.version} not supported (v2 only)")
          gps = true
        case 8 => require(it.version == 2, s"RGB12 v${it.version} not supported (v2 only)")
          rgb = true
        case 0 => require(it.version == 2, s"BYTE v${it.version} not supported (v2 only)")
          extra += it.size
        case other => throw new IllegalArgumentException(
          s"LAZ item type $other not supported in pointwise streams")
      }
    }
    (gps, rgb, extra)
  }

  /** Decode a pointwise (compressor 1/2) stream of legacy records.
    * Compressor 2 locates chunks via the chunk table; compressor 1 is a
    * single unchunked stream. */
  def decodePointwise(bytes: Array[Byte], pointOff: Int, total: Long,
      vlr: LazVlr, recLen: Int): Iterator[Array[Byte]] = {
    require(vlr.compressor == 1 || vlr.compressor == 2,
      s"decodePointwise: compressor ${vlr.compressor}")
    val (gps, rgb, nExtra) = legacyLayout(vlr.items)
    if (vlr.compressor == 1) {
      return decodePointwiseChunk(bytes, pointOff, total, gps, rgb, nExtra,
        recLen).iterator
    }
    require(vlr.chunkSize > 0 && vlr.chunkSize != -1,
      "adaptive-chunk LAZ (chunk size 0xFFFFFFFF) not supported")
    val table = chunkTable(bytes, pointOff).getOrElse(
      throw new IllegalArgumentException("pointwise chunked LAZ without a chunk table"))
    val chunkSize = vlr.chunkSize
    new Iterator[Array[Byte]] {
      private var ci = 0
      private var remaining = total
      private var cur: Iterator[Array[Byte]] = Iterator.empty
      def hasNext: Boolean = cur.hasNext || remaining > 0
      def next(): Array[Byte] = {
        if (!cur.hasNext) {
          val (off, _) = table(ci)
          val expect = math.min(chunkSize.toLong, remaining)
          cur = decodePointwiseChunk(bytes, off.toInt, expect, gps, rgb,
            nExtra, recLen).iterator
          remaining -= expect
          ci += 1
        }
        cur.next()
      }
    }
  }

  private def decodePointwiseChunk(bytes: Array[Byte], off: Int, count: Long,
      gps: Boolean, rgb: Boolean, nExtra: Int, recLen: Int): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](count.toInt)
    if (count == 0) return out
    out(0) = java.util.Arrays.copyOfRange(bytes, off, off + recLen)
    if (count == 1) return out
    val dec = new ArDecoder(bytes, off + recLen, bytes.length)
    val p10 = new Point10(dec, null)
    p10.init(out(0), 0)
    val g11 = if (gps) new Gps11 else null
    if (gps) {
      g11.icGps = new IntDec(dec, 32, 9)
      val bb = ByteBuffer.wrap(out(0)).order(ByteOrder.LITTLE_ENDIAN)
      g11.init(bb.getLong(20))
    }
    val r12 = if (rgb) new Rgb12 else null
    val rgbOff = if (gps) 28 else 20
    if (rgb) {
      val bb = ByteBuffer.wrap(out(0)).order(ByteOrder.LITTLE_ENDIAN)
      r12.init(bb.getShort(rgbOff) & 0xffff, bb.getShort(rgbOff + 2) & 0xffff,
        bb.getShort(rgbOff + 4) & 0xffff)
    }
    val extraOff = rgbOff + (if (rgb) 6 else 0)
    val mExtra = Array.fill(nExtra)(new SymModel(256))
    val lastExtra = new Array[Int](nExtra)
    var j = 0
    while (j < nExtra) { lastExtra(j) = out(0)(extraOff + j) & 0xff; j += 1 }
    var i = 1
    while (i < count) {
      val rec = new Array[Byte](recLen)
      p10.read()
      p10.store(rec, 0)
      if (gps) {
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        bb.putLong(20, g11.read(dec))
      }
      if (rgb) {
        val v = r12.read(dec)
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        bb.putShort(rgbOff, v(0).toShort)
        bb.putShort(rgbOff + 2, v(1).toShort)
        bb.putShort(rgbOff + 4, v(2).toShort)
      }
      j = 0
      while (j < nExtra) {
        lastExtra(j) = u8Fold(dec.decodeSymbol(mExtra(j)) + lastExtra(j))
        rec(extraOff + j) = lastExtra(j).toByte
        j += 1
      }
      out(i) = rec
      i += 1
    }
    out
  }

  /** Encode legacy records as a pointwise-chunked (compressor 2) stream
    * with the standard chunk table framing. */
  def encodePointwise(records: Iterator[Array[Byte]], recLen: Int,
      gps: Boolean, rgb: Boolean, nExtra: Int, chunkSize: Int,
      pointOff: Long = 0L): Array[Byte] = {
    val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val group = new scala.collection.mutable.ArrayBuffer[Array[Byte]](chunkSize)
    def flush(): Unit = if (group.nonEmpty) {
      chunks += encodePointwiseChunk(group.toArray, gps, rgb, nExtra, recLen)
      group.clear()
    }
    records.foreach { r =>
      group += r
      if (group.length == chunkSize) flush()
    }
    flush()
    val dataLen = chunks.map(_.length.toLong).sum
    val tenc = new ArEncoder
    val tic = new IntEnc(tenc, 32, 2)
    var prev = 0
    chunks.foreach { c => tic.compress(prev, c.length, 1); prev = c.length }
    val table = if (chunks.nonEmpty) tenc.done() else Array.emptyByteArray
    val out = ByteBuffer.allocate((8 + dataLen + 8 + table.length).toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(pointOff + 8 + dataLen)
    chunks.foreach(out.put)
    out.putInt(0)
    out.putInt(chunks.length)
    out.put(table)
    out.array()
  }

  private def encodePointwiseChunk(recs: Array[Array[Byte]], gps: Boolean,
      rgb: Boolean, nExtra: Int, recLen: Int): Array[Byte] = {
    val enc = new ArEncoder
    val p10 = new Point10(null, enc)
    p10.init(recs(0), 0)
    val g11 = if (gps) new Gps11 else null
    if (gps) {
      g11.icGpsEnc = new IntEnc(enc, 32, 9)
      g11.init(ByteBuffer.wrap(recs(0)).order(ByteOrder.LITTLE_ENDIAN).getLong(20))
    }
    val r12 = if (rgb) new Rgb12 else null
    val rgbOff = if (gps) 28 else 20
    if (rgb) {
      val bb = ByteBuffer.wrap(recs(0)).order(ByteOrder.LITTLE_ENDIAN)
      r12.init(bb.getShort(rgbOff) & 0xffff, bb.getShort(rgbOff + 2) & 0xffff,
        bb.getShort(rgbOff + 4) & 0xffff)
    }
    val extraOff = rgbOff + (if (rgb) 6 else 0)
    val mExtra = Array.fill(nExtra)(new SymModel(256))
    val lastExtra = new Array[Int](nExtra)
    var j = 0
    while (j < nExtra) { lastExtra(j) = recs(0)(extraOff + j) & 0xff; j += 1 }
    var i = 1
    while (i < recs.length) {
      val rec = recs(i)
      p10.write(rec, 0)
      if (gps)
        g11.write(enc, ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN).getLong(20))
      if (rgb) {
        val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        r12.write(enc, bb.getShort(rgbOff) & 0xffff, bb.getShort(rgbOff + 2) & 0xffff,
          bb.getShort(rgbOff + 4) & 0xffff)
      }
      j = 0
      while (j < nExtra) {
        val v = rec(extraOff + j) & 0xff
        enc.encodeSymbol(mExtra(j), u8Fold(v - lastExtra(j)))
        lastExtra(j) = v
        j += 1
      }
      i += 1
    }
    val coded = if (recs.length > 1) enc.done() else Array.emptyByteArray
    val out = new Array[Byte](recLen + coded.length)
    System.arraycopy(recs(0), 0, out, 0, recLen)
    System.arraycopy(coded, 0, out, recLen, coded.length)
    out
  }
}
