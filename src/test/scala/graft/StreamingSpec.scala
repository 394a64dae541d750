package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{Ev, SessionOut}

/** Streaming twins produce the same results as the batch queries. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("tumbling window streaming agg matches batch groupBy on same data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val df = input.toDF().toDF("event_id", "ts", "event_type", "value")

    val q = EventsStreaming.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()

    val base = Timestamp.valueOf("2024-01-01 00:10:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    input.addData(
      (1L, at(0), "click", 1.25), (2L, at(10), "click", 2.00),
      (3L, at(70), "click", 4.00), (4L, at(20), "view", 8.00))
    q.processAllAvailable()

    val got = spark.table("tumbling_test")
      .select($"hour_start", $"event_type", $"n", $"sum_value_cents")
      .as[(Long, String, Long, Long)].collect().toSet
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val h1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    assert(got == Set(
      (h0, "click", 2L, 325L),
      (h1, "click", 1L, 400L),
      (h0, "view", 1L, 800L)))
    q.stop()
  }

  test("flatMapGroupsWithState sessionize closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = EventsStreaming.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()

    val ns = 1000000000L
    // user 7: events at t=0s, 60s → same session; then 4000s (> 30min gap)
    // closes it and starts session 2.
    input.addData(Ev(7L, 0L, 100L), Ev(7L, 60L * ns, 50L))
    q.processAllAvailable()
    input.addData(Ev(7L, 4000L * ns, 25L))
    q.processAllAvailable()

    val got = spark.table("sess_test").as[SessionOut].collect().toSeq
    assert(got == Seq(SessionOut(7L, 1L, 0L, 2L, 150L)))
    // the open session (started 4000s) is still in state, not emitted
    q.stop()
  }

  test("streaming sessionize agrees with the batch sessionize on testdata") {
    // Batch twin over real events, restricted to a few users for speed.
    val batch = graft.operators.Relational.eventsSessionize(spark, sfDir)
      .filter($"user_id" < 3)
      .select($"user_id", $"session_start", $"n_events", $"sum_value_cents")
      .as[(Long, Long, Long, Long)].collect().toSet

    val ev = Tables.load(spark, sfDir, "events")
      .filter($"user_id" < 3)
      .select($"user_id", $"ts", round($"value" * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
      .sortBy(e => (e._1, e._2))
      .map { case (u, ts, vc) => Ev(u, ts, vc) }

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventsStreaming.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_batch_cmp")
      .outputMode("append").start()
    input.addData(ev.toSeq: _*)
    // poison event far in the future per user closes the last session
    val maxTs = ev.map(_.tsNs).max
    input.addData((0L until 3L).map(u => Ev(u, maxTs + 10000L * 1000000000L, 0L)): _*)
    q.processAllAvailable()

    val got = spark.table("sess_batch_cmp").as[SessionOut].collect()
      .filter(s => !(s.n_events == 1L && s.sum_value_cents == 0L)) // drop poison singletons
      .map(s => (s.user_id, s.session_start, s.n_events, s.sum_value_cents)).toSet
    assert(got == batch, s"streaming=${got.size} batch=${batch.size}")
    q.stop()
  }
}
