package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join as a first-class Catalyst citizen — the
  * "(c)" tier of the custom-operator ladder (compose > Expression >
  * LogicalPlan+Strategy+SparkPlan): a logical node, a planner strategy,
  * and a physical merge operator that declares its distribution and
  * ordering REQUIREMENTS instead of shuffling by hand, so
  * EnsureRequirements plans exactly one hash exchange + sort per side
  * (and elides them when the child is already partitioned/sorted — e.g.
  * a bucketed table, which no composed union-window formulation can
  * exploit).
  *
  * Semantics match [[graft.operators.TemporalJoins.asofLastError]] (and
  * DuckDB's `ASOF LEFT JOIN ... ON l.key = r.key AND l.time >= r.time`):
  * for every left row, the greatest right `time` of the same key with
  * `time <= left.time` (inclusive), else null. Keys and times are LONGs
  * (the id/epoch-micros shape every as-of use here has); rows with null
  * key/time never match.
  *
  * The merge itself is the partition-local two-pointer walk a native
  * engine runs: both inputs arrive (key, time)-sorted, the right cursor
  * advances monotonically, and per partition only the current (key,
  * last-time) scalar is retained — O(1) state, no buffering of right
  * rows.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    outAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is PRODUCED here, not consumed from a child — without this,
  // CheckAnalysis reports it "missing from input".
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: logical as-of join → physical merge as-of join. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, out) =>
      AsOfJoinExec(lk, lt, rk, rt, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    outAttr: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  // Both sides clustered on the key: EnsureRequirements inserts (or
  // elides) the exchanges; co-partitioning across the two children is
  // its standard binary-operator contract (same as sort-merge join).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // Left rows pass through in order with a column appended: partitioning
  // and ordering survive, so a downstream window/agg on the same key
  // plans no further exchange.
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outSchema = lOut :+ outAttr
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lExtract = UnsafeProjection.create(Seq(leftKey, leftTime), lOut)
      val rExtract = UnsafeProjection.create(Seq(rightKey, rightTime), rOut)
      val result = UnsafeProjection.create(outSchema.map(a => a: Expression),
        outSchema)
      // Right cursor: (rK, rT) of the next unconsumed non-null right row.
      var rValid = false
      var rK = 0L
      var rT = 0L
      def loadNextRight(): Unit = {
        rValid = false
        while (!rValid && rIt.hasNext) {
          val er = rExtract(rIt.next())
          if (!er.isNullAt(0) && !er.isNullAt(1)) {
            rK = er.getLong(0); rT = er.getLong(1); rValid = true
          }
        }
      }
      loadNextRight()
      // Last consumed right row per current key — O(1) merge state.
      var curKey = 0L
      var curVal = 0L
      var hasVal = false
      val valRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      lIt.map { lRow =>
        val el = lExtract(lRow)
        val lNull = el.isNullAt(0) || el.isNullAt(1)
        if (!lNull) {
          val lk = el.getLong(0)
          val lt = el.getLong(1)
          while (rValid && (rK < lk || (rK == lk && rT <= lt))) {
            curKey = rK; curVal = rT; hasVal = true
            loadNextRight()
          }
          if (hasVal && curKey == lk) valRow.update(0, curVal)
          else valRow.setNullAt(0)
        } else valRow.setNullAt(0)
        result(joined(lRow, valRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.lastMatch(events, errors, ...)` appends the last
  * right `time` at or before each left row's `time` within the same key.
  * Registers the planner strategy on the session on first use (runtime
  * analog of `SparkSessionExtensions.injectPlannerStrategy`).
  */
object AsOf {
  /** Synchronized on the session: extraStrategies is a plain var, so an
    * unsynchronized check-then-append from two driver threads (the repo
    * trains models from thread pools) could lose one thread's update and
    * leave the strategy unregistered — planning would then fail.
    * Duplicate appends are merely wasteful; a LOST append is a bug, so
    * the whole read-modify-write is one critical section.
    */
  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  def lastMatch(left: DataFrame, right: DataFrame,
      key: String, time: String, rightKeyCol: String, rightTimeCol: String,
      outName: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    require(Seq(attr(lPlan, key), attr(lPlan, time), attr(rPlan, rightKeyCol),
      attr(rPlan, rightTimeCol)).forall(_.dataType == LongType),
      "as-of keys and times must be LONG")
    val outAttr = AttributeReference(outName, LongType, nullable = true)()
    org.apache.spark.sql.graftglue.Glue.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, attr(lPlan, key), attr(lPlan, time),
        attr(rPlan, rightKeyCol), attr(rPlan, rightTimeCol), outAttr))
  }
}
