package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Non-overlapping substring occurrence count (SURVEY §2 D2/D3) — the
  * counting kernel under the language-id markers and the stopword/space
  * ratios.
  *
  * The engine-portable form those features' SQL twins keep —
  * `(length(x) - length(replace(x, sub, ''))) / length(sub)` — COPIES the
  * string once per marker; language-id alone runs 15 markers, so each
  * document was rewritten 15 times per pass (and the quality filter inlines
  * the expressions a second time). This is one allocation-free indexOf walk
  * per marker. The count is identical: `replace` removes the same
  * left-to-right non-overlapping matches this loop steps over.
  */
case class CountSubstring(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    CountSubstring.count(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CountSubstring.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountSubstring =
    copy(left = l, right = r)
}

object CountSubstring {
  /** Byte-level scan: valid UTF-8 is self-synchronizing, so a byte match of
    * a valid-UTF-8 pattern can never start mid-codepoint — byte-level
    * non-overlapping counts equal char-level ones. (UTF8String.indexOf
    * re-derives the byte offset of its char `start` from position 0 on
    * every call — quadratic over many matches.)
    */
  def count(s: UTF8String, sub: UTF8String): Int = {
    val m = sub.numBytes()
    // replace(x, '', '') is a no-op -> the replace-trick count is 0
    if (m == 0) return 0
    val n = s.numBytes()
    val first = sub.getByte(0)
    var c = 0
    var i = 0
    while (i <= n - m) {
      if (s.getByte(i) == first) {
        var j = 1
        while (j < m && s.getByte(i + j) == sub.getByte(j)) j += 1
        if (j == m) { c += 1; i += m } else i += 1
      } else i += 1
    }
    c
  }

  /** Column builder: occurrences of literal `sub` in `c`. */
  def count(c: Column, sub: String): Column =
    column(CountSubstring(expression(c), expression(lit(sub))))
}
