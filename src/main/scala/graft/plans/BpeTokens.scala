package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Multi-round BPE token count (SURVEY §2 H18b) — the counting kernel under
  * the K-generation merge table
  * ([[graft.functions.TextFunctions.bpeMergeTable]]).
  *
  * Semantics: decode the string to codepoints once, then apply each merge
  * rule (a, b) → m as one in-place left-to-right non-overlapping pass over
  * the (shrinking) symbol buffer, in table order — exactly the semantics of
  * a chain of literal `replace(s, "ab", "m")` calls, which is what the
  * DuckDB oracle runs (each rule is 2 codepoints → 1, and a replacement is
  * never rescanned within its own pass). The naive chain allocates a new
  * string per rule per row (55 allocations/copies per document); this is
  * one decode + one reused int buffer, each pass O(current length), later
  * passes over already-shrunk buffers.
  *
  * Codepoint (not char/byte) decoding matters: DuckDB `length()` counts
  * codepoints, so supplementary-plane input (emoji) must count 1, not 2.
  */
case class BpeTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(a: Any): Any =
    BpeTokens.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeTokens.count($c)")

  override protected def withNewChildInternal(c: Expression): BpeTokens =
    copy(child = c)
}

object BpeTokens {

  // parallel rule arrays (left cp, right cp, merged cp), built once per JVM
  private lazy val (ruleA, ruleB, ruleM): (Array[Int], Array[Int], Array[Int]) = {
    val t = graft.functions.TextFunctions.bpeMergeTable
    (t.map(_._1.codePointAt(0)).toArray,
      t.map(r => r._1.codePointAt(r._1.offsetByCodePoints(0, 1))).toArray,
      t.map(_._2.toInt).toArray)
  }

  def count(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    // codepoint decode into a working buffer
    var arr = new Array[Int](n)
    var len = 0
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      arr(len) = cp
      len += 1
      i += Character.charCount(cp)
    }
    val (ra, rb, rm) = (ruleA, ruleB, ruleM)
    var r = 0
    while (r < ra.length) {
      val a = ra(r); val b = rb(r); val m = rm(r)
      var rd = 0
      var wr = 0
      while (rd < len) {
        if (rd + 1 < len && arr(rd) == a && arr(rd + 1) == b) {
          arr(wr) = m; rd += 2
        } else {
          arr(wr) = arr(rd); rd += 1
        }
        wr += 1
      }
      len = wr
      r += 1
    }
    len
  }

  /** Column builder: K-round BPE token count of `c`. */
  def count(c: Column): Column = column(BpeTokens(expression(c)))
}
