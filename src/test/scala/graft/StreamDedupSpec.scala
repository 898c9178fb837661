package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Streaming ingest dedup: first occurrence per content hash within the
  * watermark horizon, duplicate re-deliveries dropped ACROSS
  * micro-batches, whitespace-insensitive identity like `dedup_exact`. */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-dedup-spec")
  import spark.implicits._

  case class Doc(docId: Long, ingest_ts: Timestamp, text: String)
  private def doc(id: Long, sec: Long, text: String) =
    Doc(id, new Timestamp(sec * 1000), text)

  test("duplicates drop within the horizon, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val deduped = StreamDedup.dedupedStream(input.toDF(), horizon = "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup").outputMode("append")
      .start()
    def ids(): Set[Long] =
      spark.table("stream_dedup").select("docId").as[Long].collect().toSet

    // batch 1: A, B, and an in-batch duplicate of A differing only in
    // whitespace (normalized identity must collapse it)
    input.addData(
      doc(1, 100, "alpha bravo charlie"),
      doc(2, 101, "delta echo"),
      doc(3, 102, "alpha  bravo\tcharlie"))
    q.processAllAvailable()
    assert(ids() == Set(1L, 2L), s"in-batch duplicate must drop: ${ids()}")

    // batch 2: a re-delivery of A (cross-batch duplicate, still inside
    // the horizon) and a fresh doc C
    input.addData(
      doc(4, 110, "alpha bravo charlie"),
      doc(5, 111, "foxtrot golf"))
    q.processAllAvailable()
    q.stop()
    assert(ids() == Set(1L, 2L, 5L), s"cross-batch duplicate must drop: ${ids()}")
  }
}
