package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.streaming.StreamTopK

/** Chained stateful aggregation: per-window counts feed a bounded
  * top-k aggregate inside ONE streaming query; the closed window's
  * ranking must equal the batch ranking over the same rows, with counts
  * merged across micro-batch boundaries. */
class StreamTopKSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-topk-spec")
  import spark.implicits._

  case class Ev(ts: Timestamp, user_id: Long)
  private def ev(hour: Int, min: Int, user: Long) =
    Ev(Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"), user)

  test("streaming per-window top-k equals batch top-k over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamTopK.topKPerWindow(input.toDF(), "ts", "user_id", k = 3)
    val q = out.writeStream
      .format("memory").queryName("stream_topk").outputMode("append")
      .start()

    // window [10:00,11:00): user u appears (u % 7) + 1 times, split
    // across TWO micro-batches so the count state must merge
    val all = (0L until 20L).flatMap(u => Seq.fill((u % 7).toInt + 1)(u))
    val (h1, h2) = all.splitAt(all.length / 2)
    input.addData(h1.map(u => ev(10, (u % 60).toInt, u)): _*)
    q.processAllAvailable()
    input.addData(h2.map(u => ev(10, (u % 60).toInt, u)): _*)
    q.processAllAvailable()
    assert(spark.table("stream_topk").count() == 0,
      "append mode must hold the window until the watermark closes it")

    input.addData(ev(14, 0, 9999)) // advance the watermark
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_topk")
      .select("rank", "key", "cnt").as[(Int, Long, Long)].collect().sorted
    val batch = all.toDF("user_id")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .agg(udaf(new TopKAgg(3)).apply(col("cnt").cast("double"), col("user_id")).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "t")))
      .select((col("pos") + 1).cast("int"), col("t.id"), col("t.sim").cast("long"))
      .as[(Int, Long, Long)].collect().sorted
    assert(streamed.length == 3, s"expected 3 ranked rows: ${streamed.toSeq}")
    assert(streamed.sameElements(batch),
      s"stream ${streamed.toSeq} vs batch ${batch.toSeq}")
  }
}
