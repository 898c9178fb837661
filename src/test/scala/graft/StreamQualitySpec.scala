package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ReplicationMetrics, StreamQuality}

/** Continuous quality gating: clean rows pass, violators quarantine with
  * the rules that fired, counters accumulate, nothing is lost —
  * clean ∪ quarantined ≡ input, exactly once each. */
class StreamQualitySpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-quality-spec")
  import spark.implicits._

  private val rules = Seq(
    StreamQuality.Rule("text_null", col("text").isNull),
    StreamQuality.Rule("text_short", length(col("text")) < 5),
    StreamQuality.Rule("id_negative", col("doc_id") < 0))

  test("gate splits clean from violating, quarantines with fired rules, counts on metrics") {
    implicit val sqlCtx = spark.sqlContext
    val qdir = Files.createTempDirectory("quarantine").toString
    val cp = Files.createTempDirectory("quality-cp").toString
    val outDir = Files.createTempDirectory("clean-out").toString
    val metrics = new ReplicationMetrics

    val input = MemoryStream[(Long, String)]
    val q = StreamQuality.start(
      input.toDF().toDF("doc_id", "text"), rules, metrics, "docs", qdir, cp) {
      (clean, _) => clean.write.mode("append").parquet(outDir)
    }
    try {
      input.addData((1L, "a fine long document"), (2L, "ok"), (-3L, "negative id row"),
        (4L, null), (5L, "another good document"))
      q.processAllAvailable()
      input.addData((6L, "late clean row"), (-7L, "bad"))
      q.processAllAvailable()
    } finally q.stop()

    val clean = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(1L, 5L, 6L), s"clean side wrong: $clean")

    val quar = spark.read.parquet(qdir)
    val fired = quar.select("doc_id", "_rules_fired").as[(Long, String)].collect().toMap
    assert(fired.keySet == Set(2L, -3L, 4L, -7L))
    assert(fired(2L) == "text_short")
    assert(fired(-3L) == "id_negative")
    assert(fired(4L) == "text_null")
    assert(fired(-7L) == "text_short,id_negative") // multiple rules fire together

    // conservation: clean ∪ quarantined ≡ input, once each
    assert(clean.size + fired.size == 7)

    assert(metrics.get("quality_rows_checked", "docs") == 7)
    assert(metrics.get("quality_violations_text_null", "docs") == 1)
    assert(metrics.get("quality_violations_text_short", "docs") == 2)
    assert(metrics.get("quality_violations_id_negative", "docs") == 2)
  }

  test("a redelivered epoch does not duplicate quarantined rows") {
    val qdir = Files.createTempDirectory("quarantine3").toString
    val metrics = new ReplicationMetrics
    val batch = Seq((20L, "ok"), (21L, "a perfectly fine document")).toDF("doc_id", "text")
    // same epoch delivered twice — the crash/restart redelivery shape
    StreamQuality.gateBatch(batch, 7L, rules, metrics, "docs", qdir)((_, _) => ())
    StreamQuality.gateBatch(batch, 7L, rules, metrics, "docs", qdir)((_, _) => ())
    val quar = spark.read.parquet(qdir)
    assert(quar.count() == 1, "redelivered epoch duplicated quarantine rows")
    assert(quar.select("epoch").as[Long].head() == 7L,
      "quarantine rows lost their epoch partition key")
    // a LATER epoch with new violations still lands
    StreamQuality.gateBatch(Seq((22L, "no")).toDF("doc_id", "text"),
      8L, rules, metrics, "docs", qdir)((_, _) => ())
    assert(spark.read.parquet(qdir).count() == 2)
  }

  test("an all-clean batch quarantines nothing and writes no quarantine files") {
    val qdir = Files.createTempDirectory("quarantine2").toString
    val metrics = new ReplicationMetrics
    var got: Seq[Long] = Nil
    val batch = Seq((10L, "entirely fine document")).toDF("doc_id", "text")
    StreamQuality.gateBatch(batch, 0L, rules, metrics, "docs", qdir) {
      (clean, _) => got = clean.select("doc_id").as[Long].collect().toSeq
    }
    assert(got == Seq(10L))
    assert(!Files.list(java.nio.file.Paths.get(qdir)).findFirst().isPresent,
      "quarantine dir should stay empty")
    assert(metrics.get("quality_rows_checked", "docs") == 1)
  }
}
