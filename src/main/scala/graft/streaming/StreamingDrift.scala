package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingest-volume drift monitor — the online twin of the batch
  * `dq_drift` operator: per (event_type, epoch day), the event count's
  * z-score against the trailing 7-present-day window, advanced as
  * events arrive. This is the monitor that catches a broken producer or
  * a silent volume drop WHILE it is happening, instead of in the next
  * batch profile run.
  *
  * Shape: keyBy(event_type) → flatMapGroupsWithState with one
  * [[StreamingDrift.DriftState]] per type: the OPEN day's running
  * count plus a ring of the last 7 CLOSED days' counts — a fixed few
  * dozen bytes per event type, independent of corpus volume and of the
  * stream's age (contrast a windowed-aggregation formulation, whose
  * state would hold every in-horizon day for every type). A day CLOSES
  * when a later-day event for the same type arrives; the close emits
  * the day's SPC row iff 7 prior present days exist — exactly the
  * batch operator's `ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING` frame
  * over present days, gaps skipped identically.
  *
  * Ordering semantics, stated honestly (the [[StreamingFunnel]]
  * contract family): day counting is arrival-order-insensitive WITHIN
  * the open day, so any day-ordered arrival reproduces the batch
  * operator on every closed day (spec-asserted; the final, never-closed
  * day is the one row batch recomputation has that the online monitor
  * does not — it is still open). Closed days are immutable: a
  * late-arriving event for an already-closed day is tallied in the
  * state's `late` counter and excluded from its day's published row —
  * an SPC row once alerted on is never retracted. Batch recomputation
  * is the repair path for late data, as everywhere in this family.
  */
object StreamingDrift {

  case class Event(event_id: Long, event_type: String, tus: Long)

  case class DayCount(day: Long, n: Long)

  /** `cur` is the open day; `ring` the last ≤7 closed days, oldest
    * first; `late` the dropped-event tally for closed days.
    */
  case class DriftState(cur: Option[DayCount], ring: List[DayCount],
      late: Long)

  /** One row per closed day with a full 7-day baseline; z is None when
    * the baseline has zero variance (the batch operator's NULL).
    */
  case class DriftRow(event_type: String, day: Long, n: Long,
      mu: Double, sigma: Double, z: Option[Double])

  private val DayUs = 86400L * 1000000

  /** Close day `dc` against the ring: emit its SPC row if 7 present
    * prior days exist. Same arithmetic as the batch operator: mean and
    * POPULATION stddev of the 7 prior counts.
    */
  private def closeDay(tpe: String, dc: DayCount,
      ring: List[DayCount]): Option[DriftRow] =
    if (ring.size < 7) None
    else {
      val xs = ring.takeRight(7).map(_.n.toDouble)
      val mu = xs.sum / 7
      val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / 7)
      val z = if (sigma > 0) Some((dc.n - mu) / sigma) else None
      Some(DriftRow(tpe, dc.day, dc.n, mu, sigma, z))
    }

  /** Advance per-type SPC state over an event stream. */
  def track(events: Dataset[Event]): Dataset[DriftRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (tpe, batch, state: GroupState[DriftState]) =>
          var st = state.getOption.getOrElse(DriftState(None, Nil, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[DriftRow]
          // Collapse the micro-batch to per-day counts first (memory
          // bounded by the batch's distinct days, not its events), then
          // walk days in order.
          val days = batch.foldLeft(Map.empty[Long, Long]) { (m, e) =>
            val d = e.tus / DayUs
            m.updated(d, m.getOrElse(d, 0L) + 1L)
          }
          days.toSeq.sortBy(_._1).foreach { case (day, n) =>
            st.cur match {
              case Some(c) if day < c.day => // closed day: immutable
                st = st.copy(late = st.late + n)
              case Some(c) if day == c.day =>
                st = st.copy(cur = Some(DayCount(day, c.n + n)))
              case Some(c) => // day > cur: close cur, open day
                out ++= closeDay(tpe, c, st.ring)
                st = DriftState(Some(DayCount(day, n)),
                  (st.ring :+ c).takeRight(7), st.late)
              case None =>
                st = st.copy(cur = Some(DayCount(day, n)))
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Drive a canonicalized events parquet directory as a stream into an
    * in-memory table of [[DriftRow]]s and block until all input is
    * processed (same driver contract — and the same canonicalized-input
    * requirement — as [[StreamingFunnel.runToMemory]]).
    */
  def runToMemory(spark: SparkSession, srcDir: String, queryName: String,
      maxFilesPerTrigger: Int = 0): Unit = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
    val src = (if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader)
      .parquet(srcDir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .as[Event]
    val q = track(src)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
  }
}
