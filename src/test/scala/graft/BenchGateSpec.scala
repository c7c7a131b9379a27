package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate's two noise policies, driven by the exact shapes the
  * round-7 driver artifact exhibited: a 6.9s-spread co-tenant window
  * flagged three regressions whose per-query spread exceeded their
  * delta, then rewrote the committed prior with its inflated medians.
  * Neither may happen again.
  */
class BenchGateSpec extends AnyFunSuite {

  test("a delta within the query's own spread never flags") {
    // dd_ngram_jaccard, round 7: prior 2.69s, noisy median 4.16s,
    // spread 6.90s — ratio 1.55 but the samples disagree by more than
    // the delta. Phantom; must be suppressed.
    val flags = BenchGate.regressionFlags(
      results = Seq("dd_ngram_jaccard" -> 4.16),
      prev = Map("dd_ngram_jaccard" -> 2.69),
      spreads = Map("dd_ngram_jaccard" -> 6.90),
      cold = Nil)
    assert(flags.isEmpty)
  }

  test("a real shift with tight spread still flags") {
    // ann_topk_pq after the deliberate k=32 retune: 1.0 -> 1.53s with
    // spread 0.1s. delta 0.53 > max(0.5, 0.3) and ratio > 1.5.
    val flags = BenchGate.regressionFlags(
      results = Seq("ann_topk_pq" -> 1.53),
      prev = Map("ann_topk_pq" -> 1.0),
      spreads = Map("ann_topk_pq" -> 0.1),
      cold = Nil)
    assert(flags === Seq("ann_topk_pq" -> 1.53))
  }

  test("sub-half-second deltas never flag regardless of ratio") {
    // f4_json-style jitter: 0.2 -> 0.65s is 3.25x but only 0.45s.
    val flags = BenchGate.regressionFlags(
      results = Seq("f4_json" -> 0.65),
      prev = Map("f4_json" -> 0.2),
      spreads = Map("f4_json" -> 0.0),
      cold = Nil)
    assert(flags.isEmpty)
  }

  test("cold, failed, and prior-less queries never flag") {
    val flags = BenchGate.regressionFlags(
      results = Seq("a" -> 9.0, "b" -> -1.0, "c" -> 9.0),
      prev = Map("a" -> 1.0, "b" -> 1.0),
      spreads = Map.empty,
      cold = Seq("a"))
    assert(flags.isEmpty) // a is cold, b failed, c has no prior
  }

  test("missing spread falls back to the absolute floor only") {
    val flags = BenchGate.regressionFlags(
      results = Seq("q" -> 3.0),
      prev = Map("q" -> 1.0),
      spreads = Map.empty,
      cold = Nil)
    assert(flags === Seq("q" -> 3.0))
  }

  test("a fatal run leaves the committed prior untouched") {
    assert(BenchGate.mergedPrior(
      prev = Map("q" -> 1.0),
      results = Seq("q" -> 0.9),
      cold = Nil, maxSpread = 0.2, fatal = true).isEmpty)
  }

  test("a quiet run's medians replace the prior") {
    val merged = BenchGate.mergedPrior(
      prev = Map("q" -> 1.0, "kept" -> 2.0),
      results = Seq("q" -> 1.4, "new" -> 0.5),
      cold = Nil, maxSpread = 0.3, fatal = false)
    // latest wins (even when slower — a quiet capture is trusted, so a
    // genuine slowdown becomes the baseline), absent queries keep
    // their last good number, new queries enter.
    assert(merged === Some(Map("q" -> 1.4, "kept" -> 2.0, "new" -> 0.5)))
  }

  test("a noisy run merges per-query minima over the prior") {
    // The round-7 shape: inflated medians in a 6.9s-spread window must
    // NOT overwrite quiet priors — but real speedups still lower the
    // floor and new queries still enter.
    val merged = BenchGate.mergedPrior(
      prev = Map("inflated" -> 2.69, "sped_up" -> 3.0),
      results = Seq("inflated" -> 4.16, "sped_up" -> 1.1, "new" -> 0.7),
      cold = Nil, maxSpread = 6.9, fatal = false)
    assert(merged === Some(
      Map("inflated" -> 2.69, "sped_up" -> 1.1, "new" -> 0.7)))
  }

  test("a co-tenant burst polluting a majority of samples is discarded") {
    // w22_rolling_corr, round 10: published 12.1s (spread 9.8s) while
    // the same query measured 3.85s in isolation minutes later. The
    // burst spanned 3 of the 5 samples, so the nearest-to-overall-
    // median trim kept burst samples — the burst dragged the median
    // itself. The smallest-3 trim publishes the clean cluster.
    val polluted = List(11.9, 12.1, 13.6, 3.9, 3.8)
    assert(BenchGate.stat(polluted, 3) === 3.9)
    // With fewer burst samples the result is unchanged vs a median.
    assert(BenchGate.stat(List(3.8, 12.1, 3.9), 3) === 3.9)
  }

  test("two agreeing passes publish the min; disagreers get a 3rd pass") {
    assert(BenchGate.passesAgree(1.0, 1.2))
    assert(BenchGate.stat(List(1.2, 1.0), 3) === 1.0)
    // Half-the-faster-sample bound: a 6s query may jitter by 2s...
    assert(BenchGate.passesAgree(6.0, 8.0))
    // ...but a 3× gap is a disagreement at any size above the floor.
    assert(!BenchGate.passesAgree(1.0, 3.0))
    // Sub-half-second gaps always agree (scheduler noise floor).
    assert(BenchGate.passesAgree(0.1, 0.55))
  }

  test("an incomplete run never refreshes the prior") {
    // Round 10 closed with a 67/221 artifact on disk; a partial run's
    // floors must not leak into the committed gate.
    assert(BenchGate.mergedPrior(
      prev = Map("q" -> 1.0),
      results = Seq("q" -> 0.4),
      cold = Nil, maxSpread = 0.1, fatal = false,
      complete = false).isEmpty)
  }

  test("failed and cold results never enter the prior in any mode") {
    for (spread <- Seq(0.1, 9.0)) {
      val merged = BenchGate.mergedPrior(
        prev = Map("q" -> 1.0),
        results = Seq("q" -> -1.0, "c" -> 5.0),
        cold = Seq("c"), maxSpread = spread, fatal = false)
      assert(merged === Some(Map("q" -> 1.0)), s"spread=$spread")
    }
  }

  test("floor defense: suspects sit above 1.3x the prior, below the flag bar") {
    // Every would-be regression flag (>1.5x) must first pass through
    // the defense loop, so the suspect threshold sits BELOW RatioFloor.
    assert(BenchGate.FloorRatio < BenchGate.RatioFloor)
    assert(BenchGate.floorSuspect(1.4, Some(1.0)))
    assert(!BenchGate.floorSuspect(1.2, Some(1.0)))
    // No prior, or a degenerate one, means nothing to defend.
    assert(!BenchGate.floorSuspect(9.0, None))
    assert(!BenchGate.floorSuspect(9.0, Some(-1.0)))
  }

  test("floor defense: one at-floor sample exonerates the query") {
    // r12's official artifact flagged 7 regressions that quiet reruns
    // over unchanged code disproved — noise only inflates, so a single
    // sample back at <=1.3x the prior proves the floor still holds.
    assert(BenchGate.floorReproduced(List(4.2, 3.9, 1.2), prior = 1.0))
    assert(!BenchGate.floorReproduced(List(4.2, 3.9, 2.8), prior = 1.0))
    assert(!BenchGate.floorReproduced(Nil, prior = 1.0))
  }
}
