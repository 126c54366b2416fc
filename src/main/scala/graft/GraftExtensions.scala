package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.plans.{DotProduct, DotProductInt8, PolyHash, ShingleArray, Splitmix64, Winnow}

/** SQL registration of graft's native expressions.
  *
  * New sessions: `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Existing sessions: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.plans", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOf)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  /** name -> expression builder, shared by both registration paths. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> ((args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "shingles" -> ((args: Seq[Expression]) =>
      ShingleArray(args(0), if (args.length > 1) intArg(args(1), "shingles") else 3)),
    "winnow" -> ((args: Seq[Expression]) => Winnow(args(0),
      if (args.length > 1) intArg(args(1), "winnow") else 5,
      if (args.length > 2) intArg(args(2), "winnow") else 4)),
    // the int8 kernel (array<tinyint> or packed binary), the replayable
    // integer hashes — the same codegen expressions the operators run on,
    // callable from plain SQL
    "dot_product_int8" -> ((args: Seq[Expression]) => DotProductInt8(args(0), args(1))),
    "poly_hash" -> ((args: Seq[Expression]) => PolyHash(args(0))),
    "splitmix64" -> ((args: Seq[Expression]) => Splitmix64(args(0))),
    "array_pairs" -> ((args: Seq[Expression]) => graft.plans.ArrayPairs(args(0))),
    // non-overlapping literal-substring count (the D2/D3 counting kernel)
    "count_substring" -> ((args: Seq[Expression]) =>
      graft.plans.CountSubstring(args(0), args(1))),
    // greedy mini-BPE pair-merge count (the H18 minibpe_tokens kernel)
    "minibpe_merges" -> ((args: Seq[Expression]) =>
      graft.plans.MiniBpeCount(args(0))),
    // one-pass strided code-point sampling (the G5 perceptual-hash front)
    "stride_sample" -> ((args: Seq[Expression]) => {
      if (args.length != 2) throw new IllegalArgumentException(
        s"stride_sample expects (text, k) — got ${args.length} argument(s)")
      if (intArg(args(1), "stride_sample") <= 0)
        throw new IllegalArgumentException(
          s"stride_sample: k must be a positive literal int, got ${args(1)}")
      graft.plans.StrideSample(args(0), args(1))
    })
  )

  /** Register into an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
