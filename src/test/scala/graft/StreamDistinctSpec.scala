package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Cms, Kmv, KmvAgg}
import graft.streaming.{StreamDistinct, StreamFrequency}

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

  test("persisted window sketches roll up across windows without replaying the stream") {
    // the production pattern: the stream emits RAW per-window sketches
    // to storage; coarser scopes (here: both windows → one estimate)
    // merge the arrays later. The rollup must equal the batch sketch
    // over every row from both windows — nothing lost at the seam.
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.KmvMergeAgg
    val input = MemoryStream[Ev]
    val sk = StreamDistinct.sketchPerWindow(
      input.toDF(), "ts", "user_id", "event_type",
      windowLen = "1 hour", watermark = "2 hours", k = 64)
    val q = sk.writeStream
      .format("memory").queryName("stream_kmv_sketches").outputMode("append")
      .start()
    // two hour-windows with overlapping user populations (users 40-79
    // appear in both — the rollup must not double-count them)
    input.addData((0L until 80L).map(u => ev(10, (u % 60).toInt, u)): _*)
    input.addData((40L until 120L).map(u => ev(11, (u % 60).toInt, u)): _*)
    q.processAllAvailable()
    input.addData(ev(15, 0, 9999)) // advance watermark past both windows
    q.processAllAvailable()
    q.stop()

    val sketches = spark.table("stream_kmv_sketches")
    assert(sketches.count() == 2, "both hour windows must have emitted")
    val rolledEst = sketches
      .agg(udaf(new KmvMergeAgg(64)).apply(col("ks")).as("gks"))
      .select(Kmv.estimate(col("gks"), 64).as("est"))
      .head().getDouble(0)
    val batchEst = (0L until 120L).toDF("user_id")
      .select(Kmv.keyHash(col("user_id")).as("hv"))
      .agg(udaf(new KmvAgg(64)).apply(col("hv")).as("ks"))
      .select(Kmv.estimate(col("ks"), 64).as("est"))
      .head().getDouble(0)
    assert(rolledEst == batchEst,
      s"window rollup $rolledEst must equal the batch estimate $batchEst")
  }

  case class EvN(ts: Timestamp, user_id: Option[Long], event_type: String)

  test("null keys are dropped — COUNT(DISTINCT) semantics, no encoder crash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvN]
    val est = StreamDistinct.distinctPerWindow(
      input.toDF(), "ts", "user_id", "event_type",
      windowLen = "1 hour", watermark = "2 hours", k = 64)
    val q = est.writeStream
      .format("memory").queryName("stream_kmv_null").outputMode("append")
      .start()
    val rows = (0L until 40L).map(u =>
      EvN(Timestamp.valueOf(f"2024-01-01 10:${u % 60}%02d:00"), Some(u), "click")) ++
      Seq.fill(5)(EvN(Timestamp.valueOf("2024-01-01 10:30:00"), None, "click"))
    input.addData(rows: _*)
    q.processAllAvailable()
    input.addData(EvN(Timestamp.valueOf("2024-01-01 14:00:00"), Some(9999L), "click"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_kmv_null").collect()
    assert(out.length == 1, out.toSeq.toString)
    // 40 distinct NON-null keys, below k → the estimate is exact
    assert(out.head.getDouble(2) == 40.0, s"expected exact 40: ${out.toSeq}")
  }

  test("streaming CMS sketch equals the batch-built sketch over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val sk = StreamFrequency.sketchPerWindow(
      input.toDF(), "ts", "user_id", windowLen = "1 hour", watermark = "2 hours")
    val q = sk.writeStream
      .format("memory").queryName("stream_cms").outputMode("append")
      .start()

    // window [10:00,11:00): user 7 appears 30×, users 100..149 once each,
    // split across two micro-batches
    val batch1 = (1 to 15).map(i => ev(10, i % 60, 7L)) ++
      (100L until 125L).map(u => ev(10, (u % 60).toInt, u))
    val batch2 = (1 to 15).map(i => ev(10, (i + 20) % 60, 7L)) ++
      (125L until 150L).map(u => ev(10, (u % 60).toInt, u))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    input.addData(ev(14, 0, 9999)) // advance watermark, close the window
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_cms")
      .select("j", "b", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch-built sketch over the identical rows
    val rows = (batch1 ++ batch2).map(e => (e.ts, e.user_id)).toDF("ts", "user_id")
    val batchSketch = rows
      .select(Cms.rows(col("user_id")).as("j"), col("user_id").as("k"))
      .select(col("j"), Cms.bucket(col("j"), col("k")).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batchSketch,
      s"stream sketch diverged: ${streamed.size} vs ${batchSketch.size} cells")

    // point estimates from the emitted sketch via the probe helper:
    // the heavy key dominates its true count, an absent key reads 0
    val probes = Seq(7L, 424242L).toDF("user_id")
    val ests = Cms.estimate(spark.table("stream_cms").drop("win_start"), probes, "user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ests(7L) >= 30, s"CMS estimate ${ests(7L)} must dominate the true count 30")
    assert(ests(424242L) == 0L, s"absent key must estimate 0: ${ests(424242L)}")
  }
}
