package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Distinct word n-gram shingles of a string (SURVEY §2 E2/E3/E4).
  *
  * The composable form — `array_distinct(transform(sequence(...), i ->
  * concat(ws[i], ' ', ws[i+1], ' ', ws[i+2])))` — pays the higher-order-
  * function interpreter per element plus three array lookups and a quadratic
  * distinct; on a 100 TB corpus the shingler IS the scan cost. This is one
  * native pass: split, slide, hash-dedup, emit.
  *
  * Semantics are identical to split(' ') + n-gram + distinct (empty tokens
  * from repeated spaces preserved), matching the DuckDB oracle's
  * str_split/list_distinct form.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleArray.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    // split(' ', -1): keep empty tokens, like Spark split / DuckDB str_split
    val words = s.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Column builder: distinct word n-gram shingles. */
  def shingles(c: Column, n: Int = 3): Column = column(ShingleArray(expression(c), n))
}
