package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe over a broadcast filter (SURVEY §2
  * B33) — the scan-side predicate of [[graft.operators.Skew.bloomPrunedSemiJoin]].
  *
  * The probe sits on the FACT side of the join, before the shuffle, at scan
  * throughput — exactly the operator whose selling point is per-row
  * cheapness. As a Scala `udf` it was the one remaining per-row closure in a
  * scan-sized path: every row paid boxing + a lambda dispatch, and the
  * opaque UDF broke whole-stage-codegen fusion of the scan→filter pipeline.
  * This expression generates a direct `mightContainLong` call against a
  * per-codegen-instance filter reference resolved once from the broadcast —
  * the scan, probe, and join input stay one fused WholeStageCodegen stage
  * (SkewSpec pins plan-identical results and the fused probe).
  *
  * Result semantics are bit-identical to the UDF (same
  * `BloomFilter.mightContainLong` bits, same broadcast), so the
  * `join_bloom_prune` gate is unchanged.
  */
case class BloomMightContainLong(child: Expression, bf: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[ColumnBridge.AbstractType] = Seq(LongType)

  override def nullSafeEval(k: Any): Any =
    bf.value.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bf, bcCls)
    // resolve the broadcast once per generated-class instance, not per row
    val filterVar = ctx.addMutableState(bfCls, "graftBloomFilter",
      v => s"$v = ($bfCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, k => s"${ev.value} = $filterVar.mightContainLong($k);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object BloomProbe {
  /** Column builder: true iff the broadcast bloom filter might contain the
    * long key. No false negatives; false positives are the filter's fpp. */
  def mightContainLong(key: Column, bf: Broadcast[BloomFilter]): Column =
    column(BloomMightContainLong(expression(key), bf))
}
