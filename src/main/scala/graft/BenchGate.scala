package graft

/** Pure decision logic for [[Bench]]'s cross-round regression gate —
  * extracted so the two policies that previously lived inline in the
  * bench main (when to FLAG a slowdown, and when to let a run REWRITE
  * the committed prior) are spec-testable without a Spark session.
  *
  * Both policies exist because the driver's bench can land in a noisy
  * co-tenant window: round 7's capture had max_spread 6.9s, flagged
  * three phantom "regressions" whose per-query spread exceeded their
  * delta, and then baked its inflated medians into the committed prior
  * — so round 8's gate would have compared against numbers up to 1.7×
  * high, masking real regressions of that size.
  */
object BenchGate {
  /** A run whose worst per-query spread exceeds this is a noisy
    * capture: its medians may carry co-tenant inflation and must not
    * replace the committed prior wholesale (they may still LOWER it —
    * noise only inflates, so a minimum is trustworthy either way).
    */
  val QuietSpreadSec = 1.0

  /** Absolute floor for a regression delta: sub-half-second shifts are
    * scheduler noise on local[32] regardless of ratio.
    */
  val AbsFloorSec = 0.5

  /** Ratio a completed query must exceed vs its prior to be flagged. */
  val RatioFloor = 1.5

  /** A delta must also exceed this multiple of the query's own measured
    * spread (max−min of its trimmed samples): a query whose three
    * samples disagree by 3s cannot meaningfully flag a 2s shift.
    */
  val SpreadMult = 3.0

  /** Queries that completed in both runs and got decisively slower:
    * ratio above [[RatioFloor]] AND delta above both [[AbsFloorSec]]
    * and [[SpreadMult]]× the query's own spread. Cold (unwarmed)
    * queries are excluded — their timings are not cross-round
    * comparable by the bench contract.
    */
  def regressionFlags(
      results: Seq[(String, Double)],
      prev: Map[String, Double],
      spreads: Map[String, Double],
      cold: Seq[String]): Seq[(String, Double)] =
    results.collect {
      case (n, v) if v > 0 && !cold.contains(n) && prev.get(n).exists { p =>
        p > 0 && v > RatioFloor * p &&
          v - p > math.max(AbsFloorSec, SpreadMult * spreads.getOrElse(n, 0.0))
      } => n -> v / prev(n)
    }

  /** The next committed prior, or None to leave the file untouched.
    *
    *  - A FATAL run (OOM-class abort) never writes: its samples come
    *    from a degrading JVM and possibly fewer than the full passes.
    *  - A QUIET run (max spread ≤ [[QuietSpreadSec]]) replaces each
    *    completed query's prior with its fresh median — the normal
    *    refresh, so genuine slowdowns eventually become the baseline
    *    once they survive a quiet capture.
    *  - A NOISY run merges per-query minima: co-tenant load only
    *    inflates timings, so min(prior, new) keeps the quiet medians
    *    intact while still letting real speedups lower the floor and
    *    letting queries new to the inventory enter the prior at all.
    *
    * Failed (−1) and cold queries never enter the merge in any mode.
    */
  def mergedPrior(
      prev: Map[String, Double],
      results: Seq[(String, Double)],
      cold: Seq[String],
      maxSpread: Double,
      fatal: Boolean): Option[Map[String, Double]] = {
    if (fatal) None
    else {
      val completed = results.collect {
        case (n, v) if v > 0 && !cold.contains(n) => n -> v }
      if (maxSpread <= QuietSpreadSec) Some(prev ++ completed)
      else Some(prev ++ completed.map { case (n, v) =>
        n -> math.min(prev.getOrElse(n, v), v) })
    }
  }
}
