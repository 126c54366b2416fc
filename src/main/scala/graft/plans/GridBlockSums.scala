package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** 2-D average-pooling block sums in ONE pass (SURVEY §2 G8): interpret a
  * grid²-element array as a row-major grid×grid raster and emit the
  * (grid/block)² block sums, each over a block×block pixel window.
  *
  * The composable form — (grid/block)² sums of block² `element_at` terms —
  * is 1024 projection terms at the default 32/4 geometry, which blows the
  * 64 KB generated-method limit and drops the WHOLE stage out of
  * whole-stage codegen (observed: janino "Code grows beyond 64 KB",
  * interpreted fallback). This kernel walks the raster once per row,
  * accumulating into (grid/block)² longs; the downstream sign/band
  * projection then reads 64 small `element_at`s and codegen stays intact.
  *
  * Accepts array<int> (StrideSample's output) or array<long> (the
  * brightness/perturbation variant's transformed copy) — summation is Long
  * either way, exact for any raster of codepoint-scale values.
  */
case class GridBlockSums(child: Expression, grid: Int, block: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(grid > 0 && block > 0 && grid % block == 0,
    s"grid $grid must be a positive multiple of block $block")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] =
    Seq(ColumnBridge.typeCollection(
      ArrayType(IntegerType), ArrayType(LongType)))

  private def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any): Any =
    GridBlockSums.compute(a.asInstanceOf[ArrayData], grid, block, isLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.GridBlockSums.compute($c, $grid, $block, $isLong)")

  override protected def withNewChildInternal(c: Expression): GridBlockSums =
    copy(child = c)
}

object GridBlockSums {

  def compute(arr: ArrayData, grid: Int, block: Int,
      isLong: Boolean): GenericArrayData = {
    val nb = grid / block
    val out = new Array[Long](nb * nb)
    val n = math.min(arr.numElements(), grid * grid)
    var i = 0
    while (i < n) {
      val r = i / grid
      val c = i % grid
      out((r / block) * nb + c / block) +=
        (if (isLong) arr.getLong(i) else arr.getInt(i).toLong)
      i += 1
    }
    new GenericArrayData(out.map(Long.box(_): Any))
  }

  /** Column builder: block sums of a row-major grid²-element raster. */
  def sums(c: Column, grid: Int, block: Int): Column =
    column(GridBlockSums(expression(c), grid, block))
}
