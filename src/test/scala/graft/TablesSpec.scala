package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `Tables.load` scan-boundary contract: `events.ts` is an
  * ns-epoch LONG for the engine regardless of the physical form the
  * driver shipped — raw int64 nanoseconds (read via `nanosAsLong`) or a
  * µs-precision timestamp (driver regenerations have used BOTH). A type
  * drift here silently breaks every event query's oracle parity, so the
  * normalization is contract, not convenience.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "tables-spec")
  import spark.implicits._

  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z in µs

  test("events.ts arrives as ns-epoch long from BOTH physical forms, same values") {
    val dir = Files.createTempDirectory("tables-spec").toFile.getAbsolutePath

    // form A: µs-precision timestamp column (current driver output)
    val tsForm = Seq(
      (1L, new java.sql.Timestamp(baseMicros / 1000), 10L, "view", 1.5, "{}"),
      (2L, new java.sql.Timestamp(baseMicros / 1000 + 123456L), 11L, "click", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    tsForm.coalesce(1).write.parquet(s"$dir/A/events.parquet")

    // form B: raw int64 ns column (earlier driver output; nanosAsLong
    // reads parquet ns-timestamps this way, and a plain LONG column is
    // the same engine-facing shape)
    val nsForm = Seq(
      (1L, baseMicros * 1000L, 10L, "view", 1.5, "{}"),
      (2L, (baseMicros + 123456000L) * 1000L, 11L, "click", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    nsForm.coalesce(1).write.parquet(s"$dir/B/events.parquet")

    val a = Tables.load(spark, s"$dir/A", "events")
    val b = Tables.load(spark, s"$dir/B", "events")

    assert(a.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      s"timestamp form must normalize to long, got ${a.schema("ts").dataType}")
    assert(b.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      s"int64-ns form must stay long, got ${b.schema("ts").dataType}")

    val va = a.orderBy("event_id").select("event_id", "ts").as[(Long, Long)].collect().toSeq
    val vb = b.orderBy("event_id").select("event_id", "ts").as[(Long, Long)].collect().toSeq
    assert(va == vb, s"the two physical forms must yield identical ns values: $va vs $vb")
    assert(va.head._2 == baseMicros * 1000L)
  }

  test("non-events tables pass through untouched") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    assert(real.columns.contains("l_orderkey"))
    assert(real.count() > 0)
  }
}
