package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge.{ofRows, planOf}

/** As-of join as a first-class operator (SURVEY §2 B14, the "operator Spark
  * lacks" path (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest right-time <= left-time (or < when strict); null
  * right side when no such row exists (left outer).
  *
  * Physical algorithm: both sides hash-partitioned on the key (Catalyst's
  * EnsureRequirements inserts the exchanges) and sorted (key, time) within
  * partitions; a two-pointer merge then emits each left row with the latest
  * qualifying right row. One shuffle per side, streaming merge, O(1) state —
  * the same machinery as a sort-merge join, so it scales exactly as far.
  * A naive `l.key = r.key AND r.t <= l.t` theta-join materializes every
  * (left, earlier-right) pair first — quadratic per key — and is the thing
  * this operator exists to avoid.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: a Filter over the as-of join that only references LEFT
  * columns commutes with the join (each left row's match is independent of
  * other left rows), so it pushes below — from where Catalyst's stock rules
  * carry it all the way into the parquet scan. Without this, the custom node
  * is an optimization barrier and the filter runs after the shuffle+merge.
  */
object PushFilterThroughAsOf
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val strictLocal = strict
    val rightWidth = right.output.size
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      // latest qualifying right row for the current left key (copied: sort
      // iterators reuse their UnsafeRow buffers)
      var candKey: Any = null
      var candTime: Any = null
      var cand: InternalRow = null
      // lookahead right row not yet consumed
      var headRow: InternalRow = null
      var headKey: Any = null
      var headTime: Any = null

      def advanceHead(): Boolean = {
        headRow = null
        while (headRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKey.eval(r)
          val t = rTime.eval(r)
          if (k != null && t != null) {
            headRow = r; headKey = k; headTime = t
          }
        }
        headRow != null
      }
      advanceHead()

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) {
          proj(joined(lRow, nullRight))
        } else {
          // consume right rows with (key < k) or (key == k and time within
          // bound); the last same-key one seen is the as-of match so far
          var continue = headRow != null
          while (continue) {
            val kc = keyOrd.compare(headKey, k)
            val qualifies = kc < 0 || (kc == 0 && {
              val tc = timeOrd.compare(headTime, t)
              if (strictLocal) tc < 0 else tc <= 0
            })
            if (qualifies) {
              if (kc == 0) {
                // copyValue: buffer-backed values (UTF8String, arrays,
                // decimals) point into the sort iterator's reused row and
                // are overwritten by the next advanceHead()
                candKey = InternalRow.copyValue(headKey)
                candTime = InternalRow.copyValue(headTime)
                cand = headRow.copy()
              }
              continue = advanceHead()
            } else {
              continue = false
            }
          }
          val matched = cand != null && keyOrd.compare(candKey, k) == 0
          proj(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }
}

/** DataFrame-level API for the as-of join. */
object AsOf {

  /** Left as-of join `left` to `right` on equal key with the greatest
    * rightTime <= leftTime (< when strict). Column names must exist on their
    * respective sides; output is left columns ++ right columns.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = planOf(left)
    val rPlan = planOf(right)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (resolve(lPlan, leftKey), resolve(rPlan, rightKey))
    val (lt, rt) = (resolve(lPlan, leftTime), resolve(rPlan, rightTime))
    // the merge compares with orderings built from the LEFT types; a type
    // mismatch would otherwise surface as a mid-job ClassCastException
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: $leftKey is ${lk.dataType.sql}, $rightKey is ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: $leftTime is ${lt.dataType.sql}, $rightTime is ${rt.dataType.sql}")
    ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, strict))
  }

  /** Idempotently install the planner strategy + optimizer rule on an
    * existing session.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    }
    if (!exp.extraOptimizations.contains(PushFilterThroughAsOf)) {
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOf
    }
  }
}
