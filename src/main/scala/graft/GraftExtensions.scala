package graft

import graft.functions.{BigramFreqStats, DotProduct, MinHashSigs, SimHash60,
  SortedFreqStats, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration: exposes the native kernels to the
  * SQL surface (`SELECT graft_dot(a, b) ...`). Install with
  * `.withExtensions(new GraftExtensions)` at session build, or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Whole-operator as-of join (graft.plans): sessions built with this
    // extension plan AsOfJoinPlan without the runtime registration that
    // AsOf.lastMatch otherwise performs via experimental.extraStrategies.
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Transparent scale rewrite: median()/percentile()/percentile_cont
    // aggregates become the distributed value-grid plan (bit-compatible
    // with the builtin — see GridOrderStatsRule's scaladoc). Injected
    // into the operator-optimization fixpoint so the rewritten subtree
    // still gets pruning/pushdown from the surrounding batch.
    e.injectOptimizerRule(_ => graft.plans.GridOrderStatsRule)
  }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private[graft] val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (es: Seq[Expression]) => SimHash60(es.head)),
    ("graft_sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))),
    ("graft_sorted_freq_stats",
      new ExpressionInfo(classOf[SortedFreqStats].getName,
        "graft_sorted_freq_stats"),
      (es: Seq[Expression]) => SortedFreqStats(es.head)),
    ("graft_bigram_freq_stats",
      new ExpressionInfo(classOf[BigramFreqStats].getName,
        "graft_bigram_freq_stats"),
      (es: Seq[Expression]) => BigramFreqStats(es.head)),
    // graft_minhash_sigs(packed_hashes, k): k must be a literal int.
    // Validated here so a misuse surfaces as a clear analysis error, not
    // an internal eval()/cast exception.
    ("graft_minhash_sigs",
      new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash_sigs"),
      (es: Seq[Expression]) => {
        require(es.length == 2,
          s"graft_minhash_sigs requires 2 arguments (array, k), got ${es.length}")
        require(es(1).foldable,
          "graft_minhash_sigs: k must be a literal integer")
        es(1).eval() match {
          case n: Number => MinHashSigs(es(0), n.intValue())
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sigs: k must be a non-null integer literal, got $other")
        }
      }))

  /** Register on an existing session (temp functions, idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
