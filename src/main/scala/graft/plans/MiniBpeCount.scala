package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Greedy non-overlapping mini-BPE pair-merge count (SURVEY §2 H18) — the
  * counting kernel under `minibpe_tokens`.
  *
  * Semantically identical to `regexp_count(text, m1|m2|...|m256)` over the
  * fixed pair vocabulary ([[graft.functions.TextFunctions.miniBpeMerges]]):
  * all alternatives are two ASCII chars, so global regex matching IS the
  * greedy left-to-right non-overlapping state machine this loop runs
  * (CorpusSpec pins the equivalence; the DuckDB oracle keeps the regex
  * form). The regex alternation, however, costs O(alternatives) retries per
  * position in Java's backtracking engine — measured 0.74 s of pure match
  * time over the sf0.1 corpus — while this is one table lookup per byte: a
  * 128×128 membership table, one allocation-free pass.
  *
  * Byte-level scanning is exact for char-level semantics: the vocabulary is
  * pure ASCII and UTF-8 is self-synchronizing, so ASCII pair matches can
  * never start or end mid-codepoint; non-ASCII bytes (negative) simply
  * never match.
  */
case class MiniBpeCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(a: Any): Any =
    MiniBpeCount.count(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MiniBpeCount.count($c)")

  override protected def withNewChildInternal(c: Expression): MiniBpeCount =
    copy(child = c)
}

object MiniBpeCount {

  /** 128×128 ASCII pair membership table (16 KB, built once per JVM). */
  private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128 * 128)
    graft.functions.TextFunctions.miniBpeMerges.foreach { p =>
      t(p.charAt(0) * 128 + p.charAt(1)) = true
    }
    t
  }

  def count(s: UTF8String): Int = {
    val tbl = table
    val n = s.numBytes()
    var c = 0
    var i = 0
    while (i + 1 < n) {
      val a = s.getByte(i)
      if (a >= 0) {
        val b = s.getByte(i + 1)
        if (b >= 0 && tbl(a * 128 + b)) { c += 1; i += 2 } else i += 1
      } else i += 1
    }
    c
  }

  /** Column builder: greedy pair-merge count over `c`. */
  def count(c: Column): Column = column(MiniBpeCount(expression(c)))
}
