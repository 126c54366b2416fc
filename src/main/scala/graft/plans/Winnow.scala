package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Winnowing document fingerprints (SURVEY §2 D5).
  *
  * Classic MOSS-style winnowing: polynomial rolling hash over every k-gram of
  * the string, then the minimum hash of each sliding window of w consecutive
  * k-gram hashes (rightmost-min rule). The selected fingerprints are a
  * position-robust signature for near-dup detection: shared substrings of
  * length >= w + k - 1 are guaranteed to share a fingerprint.
  *
  * Implemented as a native Catalyst Expression with `doGenCode` (the hot loop
  * is a static method call inside whole-stage codegen — no UDF ser/de, no
  * iterator break).
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Winnow.fingerprints(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.Winnow.fingerprints($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  /** 64-bit polynomial rolling hash (base 257, natural overflow) of each
    * k-gram, then rightmost-min winnowing over windows of w hashes. Returns
    * distinct selected hashes in first-selection order.
    *
    * k-grams are k UNICODE CODE POINTS (not UTF-16 units): DuckDB's
    * `length`/`substring`/`ord` are code-point-based, so the HUGEINT oracle
    * replay is exact for any string, ASCII or not. BMP text is unaffected
    * (code point == UTF-16 unit there).
    */
  def fingerprints(s: String, k: Int, w: Int): Array[Long] = {
    val cps = codePoints(s)
    val n = cps.length
    if (n < k) return Array.empty
    val m = n - k + 1
    val hashes = new Array[Long](m)
    val base = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + cps(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * pow) * base + cps(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (m <= w) return dedup(Array(hashes.min))
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var minIdx = -1
    i = 0
    while (i + w <= m) {
      if (minIdx < i) {
        // previous window's min slid out: rescan, rightmost min wins
        minIdx = i
        var j = i + 1
        while (j < i + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        out += hashes(minIdx)
      } else if (hashes(i + w - 1) <= hashes(minIdx)) {
        minIdx = i + w - 1
        out += hashes(minIdx)
      }
      i += 1
    }
    dedup(out.toArray)
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def dedup(xs: Array[Long]): Array[Long] = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    xs.foreach(seen.add(_))
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Column builder: winnowing fingerprints of a string column. */
  def winnow(c: Column, k: Int = 5, w: Int = 4): Column = column(Winnow(expression(c), k, w))
}
