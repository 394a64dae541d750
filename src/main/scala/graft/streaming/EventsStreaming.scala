package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch events queries
  * (Relational.eventsTumbling / eventsSessionize): same semantics,
  * incremental execution with watermarks and keyed state.
  *
  * Input schema (streaming-native): event_id long, ts timestamp,
  * user_id long, event_type string, value double.
  */
object EventsStreaming {
  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark —
    * the streaming form of eventsTumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("n"), col("sum_value_cents"))

  case class Ev(user_id: Long, tsNs: Long, valueCents: Long)
  case class SessionState(sessStart: Long, lastTs: Long, n: Long, sumCents: Long, sessId: Long)
  case class SessionOut(user_id: Long, sess_id: Long, session_start: Long,
                        n_events: Long, sum_value_cents: Long)

  val GapNs: Long = 1800L * 1000000000L

  /** Session assembly with explicit keyed state — the streaming form of
    * eventsSessionize. Emits a session when the 30-min gap passes or on
    * state timeout. Assumes per-key event-time order within a batch
    * (sorted input or small batches); production hardening would buffer
    * out-of-order events up to the watermark. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          val sorted = it.toSeq.sortBy(e => (e.tsNs))
          var cur = state.getOption.flatMap(_.headOption)
          var nextId = state.getOption.flatMap(_.headOption).map(_.sessId).getOrElse(0L)
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            cur match {
              case Some(st) if e.tsNs - st.lastTs <= GapNs =>
                cur = Some(st.copy(lastTs = e.tsNs, n = st.n + 1, sumCents = st.sumCents + e.valueCents))
              case Some(st) =>
                closed += SessionOut(user, st.sessId, st.sessStart / 1000000000L, st.n, st.sumCents)
                nextId = st.sessId + 1
                cur = Some(SessionState(e.tsNs, e.tsNs, 1L, e.valueCents, nextId))
              case None =>
                nextId += 1
                cur = Some(SessionState(e.tsNs, e.tsNs, 1L, e.valueCents, nextId))
            }
          }
          cur match {
            case Some(st) => state.update(List(st))
            case None => ()
          }
          closed.iterator
      }
  }

  /** Flush helper for tests/batch-drain: closes all open sessions. */
  def finalSessions(stateRows: Seq[(Long, SessionState)]): Seq[SessionOut] =
    stateRows.map { case (u, st) =>
      SessionOut(u, st.sessId, st.sessStart / 1000000000L, st.n, st.sumCents)
    }
}
