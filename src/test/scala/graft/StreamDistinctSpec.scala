package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kmv, KmvAgg}
import graft.streaming.StreamDistinct

/** Windowed streaming distinct-count via the bounded KMV sketch: state
  * merges across micro-batches, windows emit on watermark close, and
  * the streaming estimate equals the batch estimate over the same rows
  * (one sketch, both execution modes). */
class StreamDistinctSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-distinct-spec")
  import spark.implicits._

  case class Ev(ts: Timestamp, user_id: Long, event_type: String)
  private def ev(hour: Int, min: Int, user: Long, typ: String = "click") =
    Ev(Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"), user, typ)

  test("streaming KMV estimate equals the batch estimate and tracks truth") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val est = StreamDistinct.distinctPerWindow(
      input.toDF(), "ts", "user_id", "event_type",
      windowLen = "1 hour", watermark = "2 hours", k = 64)
    val q = est.writeStream
      .format("memory").queryName("stream_kmv").outputMode("append")
      .start()

    // window [10:00,11:00): 150 distinct users delivered across TWO
    // micro-batches with duplicate re-deliveries — the sketch buffers
    // must merge across batches and dedupe
    input.addData((0L until 90L).map(u => ev(10, (u % 60).toInt, u)): _*)
    q.processAllAvailable()
    input.addData((60L until 150L).map(u => ev(10, (u % 60).toInt, u)): _*)
    q.processAllAvailable()
    assert(spark.table("stream_kmv").count() == 0,
      "append mode must hold the window until the watermark closes it")

    // an event 4 hours later advances the watermark past the window
    input.addData(ev(14, 0, 9999))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_kmv").collect()
    assert(out.length == 1, s"exactly the closed window: ${out.toSeq}")
    val streamEst = out.head.getDouble(2)

    // the batch path over the identical 150-distinct row set
    val batchEst = (0L until 150L).toDF("user_id")
      .select(Kmv.keyHash(col("user_id")).as("hv"))
      .agg(udaf(new KmvAgg(64)).apply(col("hv")).as("ks"))
      .select(Kmv.estimate(col("ks"), 64).as("est"))
      .head().getDouble(0)
    assert(streamEst == batchEst,
      s"stream $streamEst must equal batch $batchEst over the same rows")
    assert(math.abs(streamEst - 150.0) <= 0.30 * 150.0,
      s"estimate $streamEst vs true 150")
  }
}
