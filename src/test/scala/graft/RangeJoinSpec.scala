package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.RangeJoin

/** Bucketized range join: result-identical to the naive theta join,
  * planned as a hash join (never a nested loop), exact at bin
  * boundaries and with epoch-ns-scale longs. */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "range-join-spec")
  import spark.implicits._

  test("matches the naive theta join exactly") {
    // deterministic pseudo-random points and ranges, several bins wide
    val points = (1L to 500L).map(i => (i, i * 7919L % 1000L)).toDF("pid", "pt")
    val ranges = (1L to 40L).map { i =>
      val s = (i * 104729L) % 900L
      (i, s, s + 5L + (i * 13L) % 120L)
    }.toDF("rid", "s", "e")
    val naive = points.join(ranges, col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    val fast = RangeJoin.pointInInterval(points, ranges, "pt", "s", "e", binWidth = 50L)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(naive.nonEmpty, "fixture must produce matches")
  }

  test("boundary points (pt == start, pt == end, bin edges) are exact") {
    val points = Seq((1L, 100L), (2L, 149L), (3L, 150L), (4L, 99L)).toDF("pid", "pt")
    val ranges = Seq((10L, 100L, 149L)).toDF("rid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ranges, "pt", "s", "e", binWidth = 50L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L), s"inclusive [100,149] must match exactly {1,2}: $got")
  }

  test("epoch-ns magnitudes keep exact bins (the 2^53 float-division trap)") {
    val base = 1704067200000000000L // 2024-01-01 in ns — above double's mantissa
    val points = Seq((1L, base + 1L), (2L, base + 3600L * 1000000000L))
      .toDF("pid", "pt")
    val ranges = Seq((10L, base, base + 3599L * 1000000000L)).toDF("rid", "s", "e")
    val got = RangeJoin
      .pointInInterval(points, ranges, "pt", "s", "e", binWidth = 3600L * 1000000000L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("plans a hash join on the bin key, not a nested loop") {
    val points = (1L to 100L).map(i => (i, i)).toDF("pid", "pt")
    val ranges = (1L to 10L).map(i => (i, i * 10L, i * 10L + 5L)).toDF("rid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, ranges, "pt", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to all-pairs:\n${plan.take(2000)}")
  }
}
