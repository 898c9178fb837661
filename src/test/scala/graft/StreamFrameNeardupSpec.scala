package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FakeMediaCodec, FrameNeardupIndex}
import graft.streaming.StreamFrameNeardup

// top-level: Spark can't encode a case class nested inside the suite
case class MediaUpload(doc_id: Long, ingest_ts: Timestamp, content: Array[Byte])

/** Streaming frame near-dup vs the landed media corpus: the per-row
  * fingerprint path must agree bit-for-bit with the batch index+match
  * core, re-delivered candidate pairs must drop within the horizon, and
  * the index must survive a parquet save/load roundtrip. Fixture
  * payloads are MINED (deterministically) for the seed properties the
  * scenario needs — a same-content-id pair with different frame counts
  * (a re-encode/trim) and a different-content-id outsider — so the test
  * exercises partial overlap, not just exact copies. */
class StreamFrameNeardupSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-frame-neardup-spec")
  import spark.implicits._

  private def payload(tag: String): Array[Byte] =
    s"payload:$tag".getBytes("UTF-8")

  private def cidOf(c: Array[Byte]): Long = FakeMediaCodec.seed(c) % 256
  private def sampledOf(c: Array[Byte]): Int = {
    val n = FakeMediaCodec.framesOf(FakeMediaCodec.seed(c))
    (0 until n by FrameNeardupIndex.FrameStride).size
  }

  /** Deterministically mine a payload pair sharing a content id (same
    * cid ⇒ their sampled-frame sets overlap on the shorter prefix, the
    * re-encoded/trimmed-video shape) with ≥ MinShared shared frames and
    * DIFFERENT frame counts, plus an outsider with a different cid. */
  private lazy val (corpusPayload, trimmedPayload, outsiderPayload) = {
    val mined = (0 until 10000).iterator.map(i => payload(s"v$i")).flatMap { a =>
      (0 until 10000).iterator.map(i => payload(s"t$i"))
        .find(b => cidOf(b) == cidOf(a) &&
          sampledOf(b) != sampledOf(a) &&
          math.min(sampledOf(a), sampledOf(b)) >= FrameNeardupIndex.MinShared)
        .map(b => (a, b))
    }.next()
    val out = (0 until 10000).iterator.map(i => payload(s"o$i"))
      .find(c => cidOf(c) != cidOf(mined._1)).get
    (mined._1, mined._2, out)
  }

  private lazy val corpus = Seq(
    (101L, corpusPayload),
    (102L, payload("corpus-other")),
    (103L, outsiderPayload)
  ).toDF("doc_id", "content")

  private def up(id: Long, sec: Long, c: Array[Byte]) =
    MediaUpload(id, new Timestamp(sec * 1000), c)

  private lazy val uploads = Seq(
    up(1, 100, corpusPayload), // exact copy of 101 → jaccard 1e6
    up(2, 101, trimmedPayload), // same cid, fewer frames → partial overlap with 101
    up(3, 102, outsiderPayload)) // copy of 103 → full overlap with 103 only

  private def streamMatches(index: FrameNeardupIndex): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MediaUpload]
    val q = StreamFrameNeardup.matchedStream(input.toDF(), index, horizon = "10 minutes")
      .writeStream.format("memory").queryName("stream_frame_neardup").outputMode("append")
      .start()
    input.addData(uploads: _*)
    q.processAllAvailable()
    // batch 2: re-delivery of doc 1 inside the horizon → nothing new
    input.addData(up(1, 150, corpusPayload))
    q.processAllAvailable()
    q.stop()
    spark.table("stream_frame_neardup")
      .select("doc_id", "dup_of", "n_shared", "frame_jaccard_e6")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("stream matches equal the batch index+match core; re-deliveries drop") {
    val index = FrameNeardupIndex.build(corpus)
    val batch = FrameNeardupIndex.matchBatch(index,
        uploads.toDF().select($"doc_id", $"content"))
      .select("new_id", "dup_of", "n_shared", "frame_jaccard_e6")
      .as[(Long, Long, Long, Long)].collect().toSet
    // exact copy verifies at jaccard 1e6 against its corpus original
    assert(batch.exists { case (a, b, _, j) => a == 1L && b == 101L && j == 1000000L },
      s"exact copy must verify at 1e6: $batch")
    // the trim shares the shorter prefix: n_shared = min(sampled counts),
    // strictly partial (jaccard < 1e6)
    val trim = batch.find { case (a, b, _, _) => a == 2L && b == 101L }
    assert(trim.nonEmpty, s"trimmed payload must match its original: $batch")
    assert(trim.get._3 == math.min(sampledOf(corpusPayload), sampledOf(trimmedPayload)).toLong)
    assert(trim.get._4 < 1000000L, s"trim overlap must be partial: ${trim.get}")
    // the outsider copy matches ONLY its own original
    assert(batch.filter(_._1 == 3L).map(_._2) == Set(103L), s"outsider leaked: $batch")
    val stream = streamMatches(index)
    assert(stream == batch, s"stream=$stream batch=$batch")
  }

  test("index-based match ≡ the oracle-gated self-join on a shared corpus") {
    // matchBatch(new=X, corpus=Y) must produce exactly the (a∈X, b∈Y)
    // slice of the batch self-join recipe — same counts, same jaccard —
    // proving the index face can replace the one-shot query per increment
    val all = corpus.union(uploads.toDF().select($"doc_id", $"content"))
    val viaIndex = FrameNeardupIndex.matchBatch(
        FrameNeardupIndex.build(corpus), uploads.toDF().select($"doc_id", $"content"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute-force the cross slice on the JVM from the codec contract
    val fps = all.as[(Long, Array[Byte])].collect().map { case (id, c) =>
      val h = FakeMediaCodec.seed(c)
      val n = FakeMediaCodec.framesOf(h)
      id -> (0 until n by FrameNeardupIndex.FrameStride).map(i => (h % 256, i)).toSet
    }.toMap
    val want = (for {
      a <- uploads.map(_.doc_id); b <- Seq(101L, 102L, 103L)
      shared = (fps(a) intersect fps(b)).size.toLong
      if shared >= FrameNeardupIndex.MinShared
    } yield (a, b, shared, shared * 1000000L / (fps(a).size + fps(b).size - shared))).toSet
    assert(viaIndex == want, s"index=$viaIndex brute=$want")
  }

  test("index save/load roundtrip preserves matches") {
    val dir = java.nio.file.Files.createTempDirectory("frame-neardup-idx").toString
    FrameNeardupIndex.build(corpus).save(dir)
    val loaded = FrameNeardupIndex.load(spark, dir)
    val m = FrameNeardupIndex.matchBatch(loaded, uploads.toDF().select($"doc_id", $"content"))
      .select("new_id", "dup_of", "frame_jaccard_e6")
      .as[(Long, Long, Long)].collect().toSet
    assert(m.contains((1L, 101L, 1000000L)), s"loaded index must reproduce the match: $m")
  }
}
