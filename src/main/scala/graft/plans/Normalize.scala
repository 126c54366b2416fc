package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Unicode NFC normalization as a NATIVE codegen expression (SURVEY §2
  * D15): canonical composition per UAX #15 via `java.text.Normalizer`
  * (JDK built-in — no new dependency), staying inside whole-stage codegen
  * (a static call, no UDF ser/de). DuckDB's `nfc_normalize` implements the
  * same Unicode algorithm (utf8proc), so gates built on this replay
  * cross-engine for canonical-composable text.
  *
  * The fast path skips the Normalizer entirely: `isNormalized` is a cheap
  * scan that returns true for ASCII/already-composed text (the vast
  * majority of a real crawl), so at 100 TB the normalizer allocates only
  * on the rows that actually need composing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNorm {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcCol(c: Column): Column = column(NfcNormalize(expression(c)))
}
