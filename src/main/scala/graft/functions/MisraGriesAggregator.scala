package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982, "Finding
  * repeated elements") as a typed [[Aggregator]]: at most `k-1`
  * counters per buffer (the classic k-counter scheme inserts while
  * fewer than k-1 are held and decrements otherwise), guaranteeing
  * that every item whose true frequency exceeds total/k survives in
  * the final summary (merging summaries preserves it — Agarwal et al.
  * 2013, "Mergeable summaries"). Callers' thresholds must use the same
  * k (the n·k > total filter downstream matches this bound).
  * Counts in the summary are under-estimates with error ≤ total/k, so
  * callers that need exact figures re-count the surviving CANDIDATES
  * exactly (a bounded set) rather than trusting the sketch — the
  * sketch's job is to shrink the candidate space at bounded memory,
  * never to be the answer.
  *
  * Scale shape: each partition folds its rows into one k-counter map
  * (partial aggregation), buffers merge associatively, and only
  * ≤ k-entry maps ever shuffle — a full vocabulary aggregation by
  * contrast shuffles one row per DISTINCT token, unbounded at corpus
  * scale.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 1, s"k must be > 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  /** Classic MG step: increment if present; insert while room;
    * otherwise decrement every counter (evicting zeros) — the
    * "cancel one occurrence of each of k distinct items" move that
    * bounds undercount by total/k.
    */
  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c)                  => b.updated(t, c + 1)
      case None if b.size < k - 1   => b.updated(t, 1L)
      case None =>
        b.flatMap { case (s, c) => if (c > 1) Some(s -> (c - 1)) else None }
    }

  /** Merge = add counts, then retain the k-1 largest and subtract the
    * k-th largest from them (the mergeable-summaries reduction, which
    * preserves the total/k guarantee).
    */
  override def merge(b1: Map[String, Long], b2: Map[String, Long])
      : Map[String, Long] = {
    val sum = (b1.keySet ++ b2.keySet).iterator
      .map(s => s -> (b1.getOrElse(s, 0L) + b2.getOrElse(s, 0L))).toMap
    if (sum.size < k) sum
    else {
      // deterministic cut regardless of merge order: sort by
      // (count desc, token) and decrement by the k-th count
      val ranked = sum.toSeq.sortBy { case (s, c) => (-c, s) }
      val cut = ranked(k - 1)._2
      ranked.take(k - 1)
        .flatMap { case (s, c) => if (c > cut) Some(s -> (c - cut)) else None }
        .toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
