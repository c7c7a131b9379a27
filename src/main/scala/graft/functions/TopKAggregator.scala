package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row entering the bounded top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded per-group top-k as a typed [[Aggregator]] — the custom-UDAF
  * tier of the extension ladder, and the scalable form of per-group
  * top-k: each partition keeps at most k rows per group (partial
  * aggregation), partial buffers merge associatively, and only k-row
  * buffers ever shuffle. A window `row_number() <= k` by contrast sorts
  * and shuffles EVERY row of every group. Ordering is (score desc, id
  * asc) — ties are deterministic, merge order irrelevant.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    // Cheap reject before the sort: a full buffer whose worst element
    // beats the newcomer is unchanged (the common case once warm).
    if (b.length == k) {
      val worst = b.last
      if (a.score < worst.score ||
        (a.score == worst.score && a.id > worst.id)) return b
    }
    trim(b :+ a)
  }
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    trim(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
