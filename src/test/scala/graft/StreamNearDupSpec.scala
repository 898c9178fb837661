package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.NearDupIndex
import graft.streaming.StreamNearDup

// top-level: Spark can't encode a case class nested inside the suite
case class NearDupDoc(doc_id: Long, ingest_ts: Timestamp, text: String)

/** Streaming near-dup vs the landed corpus: the per-row signature path
  * must agree bit-for-bit with the batch index+match core, re-delivered
  * candidate pairs must drop within the horizon, and the index must
  * survive a parquet save/load roundtrip. */
class StreamNearDupSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-neardup-spec")
  import spark.implicits._

  private def doc(id: Long, sec: Long, text: String) =
    NearDupDoc(id, new Timestamp(sec * 1000), text)

  private val corpusText = "the quick brown fox jumps over the lazy dog today"
  private lazy val corpus = Seq(
    (101L, corpusText),
    (102L, "completely different content about spark structured streaming state"),
    (103L, "a third corpus document sharing nothing with the batch docs")
  ).toDF("doc_id", "text")

  private val batchDocs = Seq(
    doc(1, 100, corpusText), // exact copy of 101 → jaccard 1.0
    doc(2, 101, "unrelated text mentioning absolutely nothing shared anywhere at all"),
    doc(3, 102, "the quick brown fox jumps over the lazy cat today")) // near-copy of 101

  private def streamMatches(index: NearDupIndex): Set[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NearDupDoc]
    val q = StreamNearDup.matchedStream(input.toDF(), index, horizon = "10 minutes")
      .writeStream.format("memory").queryName("stream_neardup").outputMode("append")
      .start()
    input.addData(batchDocs: _*)
    q.processAllAvailable()
    // batch 2: re-delivery of doc 1 inside the horizon → must emit nothing new
    input.addData(doc(1, 150, corpusText))
    q.processAllAvailable()
    q.stop()
    spark.table("stream_neardup")
      .select("doc_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
  }

  test("stream matches equal the batch index+match core; re-deliveries drop") {
    val index = NearDupIndex.build(corpus)
    val batch = NearDupIndex.matchBatch(index,
        batchDocs.toDF().select($"doc_id", $"text"))
      .select("new_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.contains((1L, 101L, 1.0)), s"exact copy must verify at 1.0: $batch")
    assert(!batch.exists(_._1 == 2L), s"unrelated doc must not match: $batch")
    val stream = streamMatches(index)
    assert(stream == batch, s"stream=$stream batch=$batch")
  }

  test("index save/load roundtrip preserves matches") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-idx").toString
    NearDupIndex.build(corpus).save(dir)
    val loaded = NearDupIndex.load(spark, dir)
    val m = NearDupIndex.matchBatch(loaded, batchDocs.toDF().select($"doc_id", $"text"))
      .select("new_id", "dup_of", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(m.contains((1L, 101L, 1.0)), s"loaded index must reproduce the match: $m")
  }
}
