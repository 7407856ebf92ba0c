package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass sketch kernels. The higher-order-function formulations of
  * MinHash/SimHash are semantically identical but Catalyst's
  * CollapseProject inlines the pre-hashed token array into the nested
  * lambda, re-evaluating the md5 transform once per outer iteration (32x
  * for simhash bits, 12x for minhash permutations) — these expressions
  * evaluate their child array exactly once and loop in JVM ints.
  */

/** array<long> (pre-hashed shingles) -> array<long> of `numHashes` affine
  * permutation minima ((a_j*x + b_j) mod p, constants from TextOps). */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sd_minhash"
  private lazy val as: Array[Long] = (0 until numHashes).map(TextOps.mhA).toArray
  private lazy val bs: Array[Long] = (0 until numHashes).map(TextOps.mhB).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * x + bs(j)) % TextOps.MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of common elements between two SORTED distinct long arrays —
  * allocation-free merge scan for the pairwise Jaccard stage (array_intersect
  * builds a hash set per pair evaluation). */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sd_sorted_intersect_count"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(n)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 32-bit cross-engine hash: unsigned value of the first 4 md5 bytes —
  * bit-identical to conv(substr(md5(x),1,8),16,10) (Spark) and
  * ('0x'||substr(md5(x),1,8))::UBIGINT (DuckDB) but computed straight
  * from the digest bytes: no hex string, no substring, no base parse. */
case class SdHash32(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "sd_hash32"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val md = SdHash32.digest.get()
    md.reset()
    val d = md.digest(bytes)
    java.lang.Long.valueOf(
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
object SdHash32 {
  private[pipeline] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Fused word-shingle hashing: array<string> tokens -> array<long> of
  * hash32(space-joined k-shingle) — bit-identical to
  * transform(shingles(toks,k), s => hash32(s)) (and the DuckDB
  * comprehension twin) but streams token bytes straight into the digest:
  * no shingle strings, no per-element lambda interpretation. */
case class SdShingleHash32(toks: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {
  override def child: Expression = toks
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sd_shingle_hash32"
  private val space = Array[Byte](' ')

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val count = math.max(n - k + 1, 1)
    val out = new Array[Long](count)
    val md = SdHash32.digest.get()
    var i = 0
    while (i < count) {
      md.reset()
      val end = math.min(i + k, n)
      var j = i
      while (j < end) {
        if (j > i) md.update(space)
        val t = arr.getUTF8String(j)
        if (t != null) md.update(t.getBytes)
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(toks = c)
}

/** Dot product of two array<double> with strict left-to-right
  * accumulation — bit-identical to the HOF formulation
  * aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,v)=>acc+v) (and to the
  * DuckDB oracle's list_sum comprehension), but a primitive JVM loop
  * instead of per-element lambda interpretation. Ragged inputs (length
  * mismatch) yield NULL — same as the replaced HOF, where zip_with pads
  * the shorter side with nulls and the sum collapses to null. */
case class SdDot(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sd_dot"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { s = s + a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared euclidean distance, same left-to-right order as
  * aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, (s,v)=>s+v).
  * Ragged inputs yield NULL (zip_with-pad semantics), see [[SdDot]]. */
case class SdSqDist(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sd_sqdist"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s = s + d * d; i += 1 }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Index of the nearest centroid: array<double> x array<array<double>>
  * -> int (ties to the lower index). One projection replaces the
  * crossJoin(centroids) + min_by re-aggregation — the k-means assignment
  * step becomes map-only, no shuffle, no k-fold row duplication. */
case class ArgMinSqDist(vec: Expression, centroids: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def left: Expression = vec
  override def right: Expression = centroids
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sd_argmin_sqdist"
  override def nullSafeEval(v: Any, cs: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = cs.asInstanceOf[ArrayData]
    val n = a.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    val k = m.numElements()
    while (c < k) {
      val cv = m.getArray(c)
      var s = 0.0
      var i = 0
      val nn = math.min(n, cv.numElements())
      while (i < nn) { val d = a.getDouble(i) - cv.getDouble(i); s = s + d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, centroids = r)
}

/** Minimum squared euclidean distance from `vec` to any row of the
  * `centroids` matrix — the k-means|| sampling weight (companion of
  * [[ArgMinSqDist]]; same truncate-to-min-length contract). */
case class MinSqDist(vec: Expression, centroids: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def left: Expression = vec
  override def right: Expression = centroids
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sd_min_sqdist"
  override def nullSafeEval(v: Any, cs: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = cs.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bestD = Double.MaxValue
    var c = 0
    val k = m.numElements()
    while (c < k) {
      val cv = m.getArray(c)
      var s = 0.0
      var i = 0
      val nn = math.min(n, cv.numElements())
      while (i < nn) { val d = a.getDouble(i) - cv.getDouble(i); s = s + d * d; i += 1 }
      if (s < bestD) bestD = s
      c += 1
    }
    if (k == 0) null else java.lang.Double.valueOf(bestD)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, centroids = r)
}

/** array<long> (pre-hashed tokens) -> 32-bit SimHash (bit b set iff the
  * +-1 votes of bit b across hashes sum >= 0). */
case class SimHash32(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "sd_simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) >= 0) out |= 1L << b; b += 1 }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** HTML/markup stripper — the boilerplate-removal step every
  * web-corpus training pipeline runs before quality scoring (the
  * trafilatura/jusText-family preprocessing, reduced to its
  * deterministic core so a SQL oracle can restate it):
  *
  *   1. `<script>`/`<style>` elements drop WITH their content
  *      (case-insensitive; unterminated ones drop to end-of-input);
  *   2. `<!-- comments -->` drop;
  *   3. every remaining tag `<...>` becomes one space (block or inline —
  *      a single space beats gluing words across tags, and the squeeze
  *      below collapses runs); an unterminated `<` drops the tail;
  *   4. entities decode AFTER tag removal: named (&amp; &lt; &gt;
  *      &quot; &apos; &nbsp;), decimal `&#NN;`, hex `&#xHH;`;
  *      unrecognized ones stay literal;
  *   5. whitespace runs collapse to one space, ends trimmed.
  *
  * Map-only (one pass per document, no state) — at 100 TB this runs
  * inside whole-stage codegen's pipeline as a plain projection. */
case class SdStripMarkup(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "sd_strip_markup"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    @inline def regionEqIc(i: Int, lit: String): Boolean =
      i + lit.length <= n && s.regionMatches(true, i, lit, 0, lit.length)
    // A tag-name prefix match only counts if the name ENDS there — next char
    // '>', '/', or whitespace — so '<scriptable-widget>' is not a script open.
    @inline def tagEqIc(i: Int, lit: String): Boolean =
      regionEqIc(i, lit) && {
        val j = i + lit.length
        j >= n || { val c = s.charAt(j); c == '>' || c == '/' || Character.isWhitespace(c) }
      }
    def closeOf(i: Int, lit: String): Int = {
      // index just past the matching close tag's '>', or n
      var j = i
      while (j < n && !tagEqIc(j, lit)) j += 1
      if (j >= n) return n
      while (j < n && s.charAt(j) != '>') j += 1
      if (j < n) j + 1 else n
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (regionEqIc(i, "<!--")) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          sb.append(' ') // dropped spans separate words like tags do
        } else if (tagEqIc(i, "<script")) {
          i = closeOf(i + 7, "</script"); sb.append(' ')
        } else if (tagEqIc(i, "<style")) {
          i = closeOf(i + 6, "</style"); sb.append(' ')
        } else {
          val e = s.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
          sb.append(' ')
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded: String =
          if (semi < 0 || semi - i > 10) null
          else {
            val body = s.substring(i + 1, semi)
            body match {
              case "amp" => "&"
              case "lt" => "<"
              case "gt" => ">"
              case "quot" => "\""
              case "apos" => "'"
              case "nbsp" => " "
              case b if b.length >= 2 && b.charAt(0) == '#' =>
                try {
                  val cp =
                    if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
                      Integer.parseInt(b.substring(2), 16)
                    else Integer.parseInt(b.substring(1), 10)
                  if (Character.isValidCodePoint(cp) &&
                      !(cp >= 0xD800 && cp <= 0xDFFF)) // unpaired surrogates stay literal
                    new String(Character.toChars(cp))
                  else null
                } catch { case _: NumberFormatException => null }
              case _ => null
            }
          }
        if (decoded == null) { sb.append('&'); i += 1 }
        else { sb.append(decoded); i = semi + 1 }
      } else { sb.append(c); i += 1 }
    }
    // squeeze whitespace runs to one space, trim ends
    val out = new java.lang.StringBuilder(sb.length)
    var k = 0
    var pendingSpace = false
    while (k < sb.length) {
      val c = sb.charAt(k)
      if (Character.isWhitespace(c)) pendingSpace = out.length > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      k += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(out.toString)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** N-gram repetition statistics — the Gopher/RefinedWeb-family quality
  * signals that filter boilerplate-heavy and degenerately repetitive
  * documents from a training corpus (Rae et al. 2021 §A1.1 "repetition
  * removal"; reimplemented here with an EXACTLY specified integer
  * contract so a SQL oracle can restate it).
  *
  * Tokens: the input trimmed and lowercased, split on whitespace runs.
  * Over word n-grams in the space-joined normalization:
  *
  *   - n_words, total_chars: token count and normalized length
  *     (Σ word lengths + (n_words − 1) joining spaces);
  *   - top2_count/top2_chars, top3_count/top3_chars: occurrences of the
  *     most frequent 2-/3-gram (ties → lexicographically SMALLEST gram)
  *     and its character mass (count × joined-gram length) — the "most
  *     common n-gram character fraction" numerator;
  *   - dup5_chars: Σ over distinct 5-grams occurring ≥ 2 times of
  *     (count × joined-gram length) — the duplicated-n-gram character
  *     mass (a deliberate per-occurrence definition: positional
  *     overlap-dedup would be oracle-inexpressible).
  *
  * Fractions are left to the caller (top2_chars / total_chars etc.) so
  * every emitted value is an exact integer — hash-stable in the DuckDB
  * compare. Map-only one pass per document; the n-gram count maps are
  * O(words) and per-row transient — at 100 TB this is a projection, no
  * shuffle, no state. */
case class SdRepetitionStats(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("top2_count", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_count", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false)))
  override def prettyName: String = "sd_repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.toLowerCase(java.util.Locale.ROOT)
    val words: Array[String] =
      if (text.isEmpty) Array.empty else text.split("\\s+")
    val n = words.length
    var totalChars = 0L
    var i = 0
    while (i < n) { totalChars += words(i).length; i += 1 }
    if (n > 1) totalChars += n - 1
    // top-(count, lexicographically-smallest) n-gram for n = 2, 3;
    // duplicated-gram character mass for n = 5
    def top(ng: Int): (Long, Long) = {
      if (n < ng) return (0L, 0L)
      val counts = new java.util.HashMap[String, Integer]()
      var j = 0
      while (j + ng <= n) {
        val sb = new java.lang.StringBuilder()
        var q = 0
        while (q < ng) {
          if (q > 0) sb.append(' ')
          sb.append(words(j + q))
          q += 1
        }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        j += 1
      }
      var bestG: String = null
      var bestC = 0
      counts.forEach { (g, c) =>
        if (c > bestC || (c == bestC && (bestG == null || g.compareTo(bestG) < 0))) {
          bestG = g; bestC = c
        }
      }
      (bestC.toLong, bestC.toLong * bestG.length)
    }
    def dupMass(ng: Int): Long = {
      if (n < ng) return 0L
      val counts = new java.util.HashMap[String, Integer]()
      var j = 0
      while (j + ng <= n) {
        val sb = new java.lang.StringBuilder()
        var q = 0
        while (q < ng) {
          if (q > 0) sb.append(' ')
          sb.append(words(j + q))
          q += 1
        }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        j += 1
      }
      var mass = 0L
      counts.forEach { (g, c) =>
        if (c >= 2) mass += c.toLong * g.length
      }
      mass
    }
    val (t2c, t2m) = top(2)
    val (t3c, t3m) = top(3)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, totalChars, t2c, t2m, t3c, t3m, dupMass(5)))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
