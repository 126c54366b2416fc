package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** All ordered pairs (i < j) of a long array — the in-basket pair
  * enumeration behind B56/B57 (market-basket mining, co-purchase graph).
  *
  * The composable form —
  * `flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)),
  * y -> struct(x, y))))` — runs two nested lambda interpreters plus a
  * slice allocation per element; on the 100 TB corpus the basket pass IS
  * the scan cost. This is one native nested loop inside whole-stage
  * codegen. Input arrays are expected sorted-distinct (collect_set +
  * sort_array), which makes the emitted (pa, pb) canonically oriented.
  */
case class ArrayPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pa", LongType, nullable = false),
      StructField("pb", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_pairs expects array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ArrayPairs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  def compute(xs: ArrayData): GenericArrayData = {
    val n = xs.numElements()
    // n(n-1)/2 in Long: Int arithmetic would overflow (to a negative or
    // silently-wrong size) from ~46k elements, and array_pairs is exposed
    // as a general SQL function with no caller-side bound
    val sz = n.toLong * (n - 1) / 2
    require(sz <= Int.MaxValue,
      s"array_pairs: $n elements would emit $sz pairs (limit ${Int.MaxValue})")
    val out = new Array[Any](sz.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, xs.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column builder: all (i < j) pairs of a long array as structs (pa, pb). */
  def pairs(c: Column): Column = column(ArrayPairs(expression(c)))
}
