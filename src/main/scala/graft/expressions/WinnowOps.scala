package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the winnowing fingerprint path — the per-doc
  * O(n·k) staged-HOF hashing (ta_winnow's hot loop, the heaviest ta_
  * solo at sf0.1) as codegen'd single-pass loops.
  *
  * [[KarpRabinHashes]] additionally upgrades the algorithm: the HOF
  * form re-sums every k-gram (O(n·k) multiply-adds per doc); the
  * kernel ROLLS the hash — h(i+1) = (h(i) − c(i)·B^(k−1))·B + c(i+k)
  * mod P — in O(n). The rolled value is the same Σ c·B^j mod P the
  * staged form computes (intermediate mods never change the residue),
  * so hashes are bit-identical to the fallback and to the DuckDB
  * oracle's `list_transform` mirror.
  *
  * Character semantics match `ascii(substr(text, i, 1))`: one value
  * per Unicode CODE POINT (UTF8String counts characters by code
  * point, and `ascii` returns the first code point).
  */
object WinnowKernels {
  /** Shared by interpreted eval and the generated code. */
  def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0
    var i = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      out(i) = cp
      i += 1
      ci += Character.charCount(cp)
    }
    out
  }

  def hashes(cps: Array[Int], k: Int, b: Long, p: Long): Array[Long] = {
    val n = cps.length
    if (n >= k) {
      // pow = B^(k-1) mod P — the leading coefficient rolled out
      var pow = 1L
      var j = 1
      while (j < k) { pow = pow * b % p; j += 1 }
      val out = new Array[Long](n - k + 1)
      var h = 0L
      j = 0
      while (j < k) { h = (h * b + cps(j)) % p; j += 1 }
      out(0) = h
      var i = 1
      while (i <= n - k) {
        h = ((h - cps(i - 1) * pow % p + p) % p * b + cps(i + k - 1)) % p
        out(i) = h
        i += 1
      }
      out
    } else {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * b + cps(i)) % p; i += 1 }
      Array(h)
    }
  }

  def windowMinima(hs: ArrayData, w: Int): Array[Long] = {
    val n = hs.numElements()
    if (n >= w) {
      val out = new Array[Long](n - w + 1)
      var j = 0
      while (j <= n - w) {
        var m = hs.getLong(j)
        var o = 1
        while (o < w) {
          val v = hs.getLong(j + o)
          if (v < m) m = v
          o += 1
        }
        out(j) = m
        j += 1
      }
      out
    } else {
      var m = hs.getLong(0)
      var i = 1
      while (i < n) { val v = hs.getLong(i); if (v < m) m = v; i += 1 }
      Array(m)
    }
  }
}

/** All k-gram Karp-Rabin hashes of a string (one whole-text fold for
  * docs shorter than k — including the empty string, which folds to 0,
  * matching `aggregate(cs, 0L, ...)` over an empty array).
  */
case class KarpRabinHashes(child: Expression, k: Int, b: Long, p: Long)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "karp_rabin_hashes"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowKernels.hashes(
      WinnowKernels.codePoints(input.asInstanceOf[UTF8String]), k, b, p))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cps = ctx.freshName("cps")
      s"""
         |final int[] $cps = graft.expressions.WinnowKernels.codePoints($s);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.WinnowKernels.hashes($cps, $k, ${b}L, ${p}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KarpRabinHashes =
    copy(child = newChild)
}

/** Minimum of every window of `w` consecutive elements (the winnow
  * selection); fewer than `w` elements yield their single global
  * minimum — the `when(size >= w, ...).otherwise(array_min)` branch
  * folded into one pass. Input elements must be non-null longs (the
  * hash arrays are).
  */
case class WindowMinima(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"w must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_minima"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowKernels.windowMinima(
      input.asInstanceOf[ArrayData], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.WinnowKernels.windowMinima($a, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowMinima =
    copy(child = newChild)
}
