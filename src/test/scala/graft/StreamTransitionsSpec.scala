package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics
import graft.streaming.StreamTransitions
import graft.streaming.StreamTransitions.Ev

/** The continuously maintained transition matrix must EQUAL the batch
  * `events_transitions` recompute over the same event log — the
  * transition that straddles a micro-batch boundary is the code path a
  * per-batch lag window can never produce. */
class StreamTransitionsSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-transitions-spec")
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private lazy val events = Tables.load(spark, sf, "events")
    .select(col("user_id").cast("long"), col("event_type"),
      col("ts").cast("long"), col("event_id").cast("long"))
    .as[(Long, String, Long, Long)]
    .collect().toSeq
    .map { case (u, t, ts, id) => Ev(u, t, ts, id) }
    .sortBy(e => (e.tsNs, e.eventId)) // global time order, split mid-stream

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSet

  test("three-epoch stream matrix equals the batch recompute (boundary transitions kept)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val third = events.size / 3
    val q = StreamTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName("trans_sink")
      .outputMode("append").start()
    try {
      input.addData(events.take(third))
      q.processAllAvailable()
      input.addData(events.slice(third, 2 * third))
      q.processAllAvailable()
      input.addData(events.drop(2 * third))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = rows(StreamTransitions.matrix(spark.table("trans_sink")))
    val batch = rows(Analytics.eventsTransitions(spark, sf))
    assert(streamed == batch)
    // the boundary path actually fired: some user's pair spans the epoch
    // split, so a per-batch-only lag would have produced FEWER pairs
    val perBatchOnly = Seq(events.take(third), events.slice(third, 2 * third),
        events.drop(2 * third))
      .map { slice =>
        slice.toDS().groupByKey(_.userId).flatMapGroups { (_, it) =>
          it.toSeq.sortBy(e => (e.tsNs, e.eventId)).sliding(2).collect {
            case Seq(a, b) if b.tsNs - a.tsNs <= StreamTransitions.GapNs => 1
          }
        }.count()
      }.sum
    val total = spark.table("trans_sink").count()
    assert(total > perBatchOnly,
      s"no cross-epoch transition exercised ($total vs per-batch $perBatchOnly)")
  }
}
