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

/** G8's WHOLE signature in one native call (round-11 bench fix): raster
  * pooling + global mean + sign-pack of the word and every band, straight
  * from the strided sample. The composable form — an interpreted 1024-term
  * `transform` feeding [[GridBlockSums]] feeding ~190 `element_at` sign
  * terms — re-evaluated the transform chain per REFERENCE once projection
  * collapse fused the stages (32 s/run at sf0.1; count() pruned it to
  * 0.2 s, which is how it hid). One expression evaluates the chain exactly
  * once per row and stays a single static call inside whole-stage codegen.
  * Arithmetic is op-for-op the composable form's: code = raw[i] + bright
  * (+ boost on perturbed pixels), block sums over block² cells, bit j set
  * iff sums(j)·wBits > total — so signatures are bit-identical and the
  * DuckDB oracle is untouched.
  *
  * Returns array<long> of (wBits/64 words) ++ (nBands band keys), the
  * layout [[graft.multimodal.Multimodal]] slices into (ph, bvs).
  */
case class Phash2dSig(left: Expression, right: Expression,
    bright: Int, boost: Int, grid: Int, block: Int, nBands: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(raw: Any, pert: Any): Any =
    Phash2dSig.compute(raw.asInstanceOf[ArrayData], pert.asInstanceOf[ArrayData],
      bright, boost, grid, block, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, p) =>
      s"graft.plans.Phash2dSig.compute($r, $p, $bright, $boost, $grid, $block, $nBands)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Phash2dSig =
    copy(left = l, right = r)
}

object Phash2dSig {

  def compute(raw: ArrayData, pert: ArrayData, bright: Int, boost: Int,
      grid: Int, block: Int, nBands: Int): GenericArrayData = {
    val nb = grid / block
    val wBits = nb * nb
    val sums = new Array[Long](wBits)
    val n = math.min(raw.numElements(), grid * grid)
    val np = pert.numElements()
    var i = 0
    while (i < n) {
      var v = raw.getInt(i).toLong + bright
      var j = 0
      while (j < np) { if (pert.getLong(j) == i.toLong) v += boost; j += 1 }
      sums((i / grid / block) * nb + (i % grid) / block) += v
      i += 1
    }
    var tot = 0L
    var b = 0
    while (b < wBits) { tot += sums(b); b += 1 }
    // same band layout derivation as the composable form: first
    // (wBits mod nBands) bands carry one extra bit (nBands = 0 → words
    // only, the G5/G6 1-D signature case)
    val base = if (nBands > 0) wBits / nBands else 0
    val extra = if (nBands > 0) wBits % nBands else 0
    val out = new Array[Long](wBits / 64 + nBands)
    b = 0
    while (b < wBits) {
      if (sums(b) * wBits > tot) out(b / 64) |= (1L << (b % 64))
      b += 1
    }
    var band = 0
    var off = 0
    while (band < nBands) {
      val width = base + (if (band < extra) 1 else 0)
      var k = 0
      var key = 0L
      while (k < width) {
        if (sums(off + k) * wBits > tot) key |= (1L << k)
        k += 1
      }
      out(wBits / 64 + band) = key
      band += 1
      off += width
    }
    new GenericArrayData(out.map(Long.box(_): Any))
  }

  /** Column builder: packed 2-D pHash words ++ band keys. */
  def sig(raw: Column, pert: Column, bright: Int, boost: Int,
      grid: Int, block: Int, nBands: Int): Column =
    column(Phash2dSig(expression(raw), expression(pert),
      bright, boost, grid, block, nBands))
}
