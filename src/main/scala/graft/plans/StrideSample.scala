package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** k evenly-strided code points of a string in ONE pass (SURVEY §2 G5):
  * sample i is the code point at 1-based character position
  * `(i * n) DIV k + 1` — element-for-element identical to the composable
  * form `ascii(substring(text, (i * char_length) DIV k + 1, 1))`, which the
  * DuckDB oracles keep (`ord(substring(...))`, same code-point semantics).
  *
  * The composable form costs O(k·n) per row: each dynamic-position
  * `substring` re-walks the string from byte 0 to find its character
  * offset, and the perceptual-hash projection takes k=64 of them — the
  * sampling pass alone was ~1.4 s of mm_phash_dedup's ~3 s at sf0.1. This
  * expression walks the code points once (sample positions are
  * non-decreasing by construction), so the row cost is O(n) + one k-int
  * array.
  */
case class StrideSample(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(StringType, IntegerType)

  override def nullSafeEval(s: Any, k: Any): Any =
    StrideSample.compute(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.plans.StrideSample.compute($s, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrideSample =
    copy(left = l, right = r)
}

object StrideSample {
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    require(k > 0, s"stride_sample: k must be positive, got $k")
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val out = new Array[Any](k)
    if (n == 0) {
      // substring('', p, 1) = '' and ascii('') = 0 — match that exactly
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], Int.box(0))
      return new GenericArrayData(out)
    }
    // target 0-based code-point indexes (i * n) / k are non-decreasing, so
    // one forward walk serves all of them (repeats when n < k re-emit the
    // current code point, matching the duplicate substrings)
    var i = 0       // sample index
    var cpIdx = 0   // code-point index of the cursor
    var off = 0     // UTF-16 offset of the cursor
    var cp = str.codePointAt(0)
    while (i < k) {
      val target = ((i.toLong * n) / k).toInt
      while (cpIdx < target) {
        off += Character.charCount(cp)
        cpIdx += 1
        cp = str.codePointAt(off)
      }
      out(i) = cp
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: k strided code points as array<int>. */
  def sample(c: Column, k: Int): Column =
    column(StrideSample(expression(c), expression(lit(k))))
}
