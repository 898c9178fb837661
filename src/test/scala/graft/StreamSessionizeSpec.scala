package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSessionize
import graft.streaming.StreamSessionize.{Event, Session}

/** Streaming sessionization: sessions close on in-batch gap violations
  * and on event-time timeout when the watermark advances. */
class StreamSessionizeSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-sessionize-spec")
  import spark.implicits._

  private def ev(user: Long, sec: Long, v: Double = 1.0) =
    Event(user, new Timestamp(sec * 1000), v)

  test("sessions close by in-batch gap and by watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val withWm = input.toDS().withWatermark("ts", "0 seconds")
    val sessions = StreamSessionize.sessions(withWm, gapMs = 30000) // 30 s gap
    val q = sessions.writeStream
      .format("memory").queryName("stream_sessions").outputMode("append")
      .start()
    def got(): Set[(Long, Long, Long, Int, Double)] =
      spark.table("stream_sessions").as[Session].collect()
        .map(s => (s.userId, s.startTs.getTime / 1000, s.endTs.getTime / 1000, s.nEvents, s.sumValue))
        .toSet

    // batch 1: user 1 has two events 10 s apart, then one 90 s later —
    // the in-batch gap closes the first session immediately. (Times sit
    // well above epoch 0: the initial watermark is 0 and a t=0 event
    // would be dropped as late.)
    input.addData(ev(1, 100), ev(1, 110), ev(1, 200, 2.0))
    q.processAllAvailable()
    assert(got() == Set((1L, 100L, 110L, 2, 2.0)))

    // batch 2: another user far in the future advances the watermark
    // past 200 s + gap → user 1's open session times out and emits
    input.addData(ev(2, 1000))
    q.processAllAvailable()
    // one more batch so the timeout fires after the watermark update
    // (the watermark advances at batch completion)
    input.addData(ev(2, 1001))
    q.processAllAvailable()
    q.stop()
    assert(got().contains((1L, 200L, 200L, 1, 2.0)),
      s"watermark-timeout session missing from ${got()}")
  }
}
