package graft.sources.fgb

/** Minimal FlatBuffers wire-format primitives (little-endian, back-to-front
  * builder, vtable-per-table) — just enough to encode/decode the FlatGeobuf
  * tables (Header/Column/Feature/Geometry). Follows the public FlatBuffers
  * internals documentation; no generated code, no external dependency.
  */
object FlatBuf {

  /** Back-to-front builder. Offsets returned by createXxx/endTable are
    * "positions from buffer end"; cross-references are resolved when the
    * referencing u32 is written. */
  final class Builder(initial: Int = 1024) {
    private var buf = new Array[Byte](math.max(initial, 64))
    private var space = buf.length
    private var maxAlign = 4

    def offset: Int = buf.length - space

    private def grow(needed: Int): Unit = {
      if (space >= needed) return
      val used = buf.length - space
      var n = buf.length
      while (n - used < needed) n *= 2
      val nb = new Array[Byte](n)
      System.arraycopy(buf, space, nb, n - used, used)
      space = n - used
      buf = nb
    }

    /** Align so that after writing `additional` bytes the offset-from-end is
      * a multiple of `align`; grow as needed. */
    def prep(align: Int, additional: Int): Unit = {
      if (align > maxAlign) maxAlign = align
      var pad = ((~(offset + additional)) + 1) & (align - 1)
      grow(pad + additional + align)
      while (pad > 0) { space -= 1; buf(space) = 0; pad -= 1 }
    }

    def putByte(v: Byte): Unit = { space -= 1; buf(space) = v }
    def putShort(v: Short): Unit = {
      space -= 2
      buf(space) = (v & 0xff).toByte; buf(space + 1) = ((v >> 8) & 0xff).toByte
    }
    def putInt(v: Int): Unit = {
      space -= 4
      var i = 0
      while (i < 4) { buf(space + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putLong(v: Long): Unit = {
      space -= 8
      var i = 0
      while (i < 8) { buf(space + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putDouble(v: Double): Unit = putLong(java.lang.Double.doubleToLongBits(v))

    /** Write a u32 reference to a previously created object. */
    def putRef(target: Int): Unit = {
      prep(4, 0)
      putInt(offset + 4 - target)
    }

    def createString(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1)
      putByte(0)
      space -= bytes.length
      System.arraycopy(bytes, 0, buf, space, bytes.length)
      putInt(bytes.length)
      offset
    }

    def createByteVector(a: Array[Byte]): Int = {
      prep(4, a.length)
      space -= a.length
      System.arraycopy(a, 0, buf, space, a.length)
      putInt(a.length)
      offset
    }

    def createDoubleVector(a: Array[Double]): Int = {
      // element data must land 8-aligned with the u32 length just below it
      prep(4, 8 * a.length)
      prep(8, 8 * a.length)
      var i = a.length - 1
      while (i >= 0) { putDouble(a(i)); i -= 1 }
      putInt(a.length)
      offset
    }

    def createUIntVector(a: Array[Int]): Int = {
      prep(4, 4 * a.length + 4)
      var i = a.length - 1
      while (i >= 0) { putInt(a(i)); i -= 1 }
      putInt(a.length)
      offset
    }

    def createRefVector(offsets: Array[Int]): Int = {
      prep(4, 4 * offsets.length + 4)
      var i = offsets.length - 1
      while (i >= 0) { putRef(offsets(i)); i -= 1 }
      putInt(offsets.length)
      offset
    }

    // ---- table building: collect (slot, writer) thunks, then endTable
    // writes fields back-to-front followed by the vtable ----
    private var slots: List[(Int, () => Unit, Int, Int)] = Nil // slot, write, align, size

    def startTable(): Unit = slots = Nil

    def slotByte(slot: Int, v: Byte, default: Byte = 0): Unit =
      if (v != default) slots ::= ((slot, () => putByte(v), 1, 1))
    def slotBool(slot: Int, v: Boolean): Unit =
      if (v) slots ::= ((slot, () => putByte(1), 1, 1))
    def slotShort(slot: Int, v: Short, default: Short = 0): Unit =
      if (v != default) slots ::= ((slot, () => putShort(v), 2, 2))
    def slotInt(slot: Int, v: Int, default: Int = 0): Unit =
      if (v != default) slots ::= ((slot, () => putInt(v), 4, 4))
    def slotLong(slot: Int, v: Long, default: Long = 0L): Unit =
      if (v != default) slots ::= ((slot, () => putLong(v), 8, 8))
    def slotDouble(slot: Int, v: Double): Unit =
      slots ::= ((slot, () => putDouble(v), 8, 8))
    def slotRef(slot: Int, target: Int): Unit =
      if (target != 0) slots ::= ((slot, () => putRef(target), 4, 4))

    def endTable(): Int = {
      // fields: write in slot order so later (higher-addressed) fields are
      // written first (back-to-front buffer)
      val fieldPos = new scala.collection.mutable.HashMap[Int, Int]()
      slots.sortBy(_._1).foreach { case (slot, write, align, size) =>
        prep(align, size)
        write()
        fieldPos(slot) = offset
      }
      // table start: the i32 soffset-to-vtable cell
      prep(4, 4)
      putInt(0) // placeholder
      val tablePos = offset
      // vtable
      val maxSlot = if (fieldPos.isEmpty) -1 else fieldPos.keys.max
      val vtLen = 4 + 2 * (maxSlot + 1)
      prep(2, vtLen)
      var s = maxSlot
      while (s >= 0) {
        putShort(fieldPos.get(s).map(f => (tablePos - f).toShort).getOrElse(0.toShort))
        s -= 1
      }
      putShort(vtLen.toShort)          // table size not tracked precisely:
      putShort(vtLen.toShort)          // readers use per-field offsets only
      val vtPos = offset
      // patch the soffset: stored i32 at tablePos (buffer coords) =
      // tableBufPos - vtableBufPos = vtPos - tablePos (pos-from-end space)
      val patchAt = buf.length - tablePos
      val v = vtPos - tablePos
      var i = 0
      while (i < 4) { buf(patchAt + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
      slots = Nil
      tablePos
    }

    /** Size-prefixed finish: [u32 size][buffer with root ref at start]. */
    def finishSizePrefixed(root: Int): Array[Byte] = {
      prep(maxAlign, 8)
      putRef(root)
      val size = offset
      putInt(size)
      java.util.Arrays.copyOfRange(buf, space, buf.length)
    }
  }

  /** Random-access reader over one flatbuffer (no size prefix). */
  final class Table(val bytes: Array[Byte], val pos: Int) {
    @inline private def u16(p: Int): Int =
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    @inline private def i32(p: Int): Int =
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
    @inline private def i64(p: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(p + i) & 0xffL); i -= 1 }
      v
    }

    /** Absolute position of field `slot`, or -1 when absent. */
    def fieldPos(slot: Int): Int = {
      val vt = pos - i32(pos)
      val vtSize = u16(vt)
      val fo = 4 + 2 * slot
      if (fo + 2 > vtSize) -1
      else {
        val off = u16(vt + fo)
        if (off == 0) -1 else pos + off
      }
    }

    def getByte(slot: Int, default: Byte): Byte = {
      val p = fieldPos(slot); if (p < 0) default else bytes(p)
    }
    def getBool(slot: Int, default: Boolean): Boolean = {
      val p = fieldPos(slot); if (p < 0) default else bytes(p) != 0
    }
    def getShort(slot: Int, default: Short): Short = {
      val p = fieldPos(slot); if (p < 0) default else u16(p).toShort
    }
    def getInt(slot: Int, default: Int): Int = {
      val p = fieldPos(slot); if (p < 0) default else i32(p)
    }
    def getLong(slot: Int, default: Long): Long = {
      val p = fieldPos(slot); if (p < 0) default else i64(p)
    }
    def getString(slot: Int): String = {
      val p = fieldPos(slot)
      if (p < 0) null
      else {
        val sp = p + i32(p)
        val len = i32(sp)
        new String(bytes, sp + 4, len, "UTF-8")
      }
    }
    /** (elementsStart, length) of a vector field, or null. */
    def vector(slot: Int): (Int, Int) = {
      val p = fieldPos(slot)
      if (p < 0) null
      else {
        val vp = p + i32(p)
        (vp + 4, i32(vp))
      }
    }
    def getDoubleVector(slot: Int): Array[Double] = {
      val v = vector(slot)
      if (v == null) null
      else Array.tabulate(v._2)(i => java.lang.Double.longBitsToDouble(i64(v._1 + 8 * i)))
    }
    def getUIntVector(slot: Int): Array[Int] = {
      val v = vector(slot)
      if (v == null) null else Array.tabulate(v._2)(i => i32(v._1 + 4 * i))
    }
    def getByteVector(slot: Int): Array[Byte] = {
      val v = vector(slot)
      if (v == null) null else java.util.Arrays.copyOfRange(bytes, v._1, v._1 + v._2)
    }
    /** Sub-table at vector element i (vector of table refs). */
    def tableAt(v: (Int, Int), i: Int): Table = {
      val p = v._1 + 4 * i
      new Table(bytes, p + i32(p))
    }
    def getTable(slot: Int): Table = {
      val p = fieldPos(slot)
      if (p < 0) null else new Table(bytes, p + i32(p))
    }
  }

  /** Root table of a size-prefixed flatbuffer starting at `start`
    * (start points at the u32 size). Returns (table, bytesConsumed). */
  def rootSizePrefixed(bytes: Array[Byte], start: Int): (Table, Int) = {
    val size = (bytes(start) & 0xff) | ((bytes(start + 1) & 0xff) << 8) |
      ((bytes(start + 2) & 0xff) << 16) | ((bytes(start + 3) & 0xff) << 24)
    val bufStart = start + 4
    val rootOff = (bytes(bufStart) & 0xff) | ((bytes(bufStart + 1) & 0xff) << 8) |
      ((bytes(bufStart + 2) & 0xff) << 16) | ((bytes(bufStart + 3) & 0xff) << 24)
    (new Table(bytes, bufStart + rootOff), 4 + size)
  }
}
