package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIntervalJoin

/** Stream-stream interval join: in-window pairs match, out-of-window
  * and wrong-key pairs don't, and the left-outer variant emits the
  * unmatched row once the watermark closes its window. */
class StreamIntervalJoinSpec extends AnyFunSuite {

  case class View(vKey: Long, vTs: Timestamp, page: String)
  case class Click(cKey: Long, cTs: Timestamp, target: String)

  lazy val spark = GraftSession.build(4, "stream-ij-spec")
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("clicks attribute to views within the 60 s window only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val joined = StreamIntervalJoin.intervalJoin(
      views.toDF(), clicks.toDF(),
      leftKey = "vKey", rightKey = "cKey", leftTs = "vTs", rightTs = "cTs",
      lower = "0 seconds", upper = "60 seconds", watermark = "10 seconds")
    val q = joined
      .selectExpr("vKey", "page", "target")
      .writeStream.format("memory").queryName("attributed").outputMode("append")
      .start()

    views.addData(View(1, ts(100), "home"), View(2, ts(100), "docs"))
    clicks.addData(
      Click(1, ts(130), "signup"), // in window → match
      Click(1, ts(300), "late"), // 200 s after the view → no match
      Click(2, ts(90), "early"), // before the view → no match
      Click(3, ts(130), "other")) // key with no view → no match
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attributed").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "home", "signup")))
  }

  test("left outer emits unmatched views after the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[View]
    val clicks = MemoryStream[Click]
    val joined = StreamIntervalJoin.intervalJoin(
      views.toDF(), clicks.toDF(),
      leftKey = "vKey", rightKey = "cKey", leftTs = "vTs", rightTs = "cTs",
      lower = "0 seconds", upper = "60 seconds", watermark = "5 seconds",
      joinType = "left_outer")
    val q = joined
      .selectExpr("vKey", "page", "target")
      .writeStream.format("memory").queryName("attributed_outer").outputMode("append")
      .start()

    views.addData(View(1, ts(100), "home"), View(2, ts(100), "docs"))
    clicks.addData(Click(1, ts(120), "signup"))
    q.processAllAvailable()
    // advance both watermarks far past 100 + 60 so view 2's window is
    // provably empty; an extra batch lets the null-emit fire after the
    // watermark update (watermarks advance at batch completion)
    views.addData(View(9, ts(1000), "x"))
    clicks.addData(Click(9, ts(2000), "y"))
    q.processAllAvailable()
    views.addData(View(9, ts(1001), "x"))
    clicks.addData(Click(9, ts(2001), "y"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attributed_outer").as[(Long, String, Option[String])]
      .collect().toSet
    assert(got.contains((1L, "home", Some("signup"))))
    assert(got.contains((2L, "docs", None)),
      s"unmatched view should emit with null target after watermark: $got")
  }
}
