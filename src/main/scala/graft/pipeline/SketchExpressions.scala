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
