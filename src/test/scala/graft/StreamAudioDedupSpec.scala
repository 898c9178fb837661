package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamAudioDedup, StreamShardedExport}

// top-level: Spark can't encode a case class nested inside the suite
case class AudioUpload(doc_id: Long, content: Array[Byte])

/** Continuous audio-fingerprint dedup: the streamed ingest must land
  * exactly the rows the batch chain admits (stream ≡ batch), drops
  * must equal the batch `mm_audio_dedup` grouping's verdict over
  * corpus ∪ arrivals (≡ the oracle-gated predicate), non-audio rows
  * must pass the audio lane untouched, the index must survive a
  * parquet roundtrip, and a redelivered epoch must not double-land. */
class StreamAudioDedupSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-audio-dedup-spec")
  import spark.implicits._

  /** A sniffable WAV payload: RIFF....WAVE magic + distinguishing tail
    * (the same prefix shape the fake payload column builds). */
  private def wav(tag: String): Array[Byte] =
    "RIFF".getBytes("UTF-8") ++ "xxxx".getBytes("UTF-8") ++
      "WAVE".getBytes("UTF-8") ++ tag.getBytes("UTF-8")
  private def png(tag: String): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      tag.getBytes("UTF-8")

  private lazy val corpus = Seq(
    (900L, wav("landed-song-a")),
    (901L, wav("landed-song-b"))
  ).toDF("doc_id", "content")

  test("stream ingest ≡ batch chain ≡ the mm_audio_dedup grouping over corpus ∪ arrivals; redelivery no-ops") {
    implicit val sqlCtx = spark.sqlContext

    // persisted index: build → parquet → read, the production shape
    val idxDir = java.nio.file.Files.createTempDirectory("audio-idx").toString
    StreamAudioDedup.fingerprintIndex(corpus).write.mode("overwrite").parquet(idxDir)
    val index = spark.read.parquet(idxDir)

    // arrivals: 1 re-uploads landed content (same bytes ⇒ same seed ⇒
    // same fingerprint), 2 is fresh audio, 3 is the non-audio lane
    val arrivals = Seq(
      AudioUpload(1L, wav("landed-song-a")),
      AudioUpload(2L, wav("fresh-song-c")),
      AudioUpload(3L, png("an-image")))

    val out = java.nio.file.Files.createTempDirectory("audio-land").toString
    val cp = java.nio.file.Files.createTempDirectory("audio-cp").toString
    val input = MemoryStream[AudioUpload]
    val q = StreamAudioDedup.start(
      input.toDF(), index, out, numShards = 2, checkpoint = cp)
    input.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()

    val landed = StreamShardedExport.readAll(spark, out)
      .select("doc_id").as[Long].collect().toSet
    // stream ≡ batch: the landed set equals the directly-called chain
    val direct = StreamAudioDedup.curateBatch(
        arrivals.toDF().select(col("doc_id"), col("content")), index)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == direct, s"stream landing $landed != direct chain $direct")
    assert(landed == Set(2L, 3L),
      s"re-upload must drop, fresh audio and the non-audio lane must land: $landed")

    // the match face names the canonical landed doc
    val matches = StreamAudioDedup.matchedStream(
        arrivals.toDF().select(col("doc_id"), col("content")), index)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(matches == Set((1L, 900L)), s"unexpected match set: $matches")

    // ≡ the batch query's verdict: mm_audio_dedup's grouping over
    // corpus ∪ arrivals finds exactly one duplicate group — the
    // re-upload with its landed canonical — so the stream dropped
    // precisely the docs the nightly batch dedup would have flagged
    val union = corpus.unionByName(
      arrivals.toDF().select(col("doc_id"), col("content")))
    val groups = graft.queries.MediaQueries.audioFingerprints(union, Seq("doc_id"))
      .groupBy(col("afp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"),
        collect_set(col("doc_id")).as("members"))
      .filter(col("n_docs") >= 2)
      .collect()
    assert(groups.length == 1, s"fixture: exactly one duplicate group expected, got ${groups.length}")
    assert(groups.head.getAs[Seq[Long]]("members").toSet == Set(1L, 900L) &&
      groups.head.getAs[Long]("canonical_doc_id") == 1L,
      "batch grouping disagrees with the stream's drop verdict")

    // redelivery of the landed epoch (the only epoch Structured
    // Streaming ever replays) must not double-land
    val before = StreamShardedExport.readAll(spark, out).count()
    StreamShardedExport.commitBatch(
      StreamAudioDedup.curateBatch(
        arrivals.toDF().select(col("doc_id"), col("content")), index),
      "doc_id", out, 2, 0L)
    assert(StreamShardedExport.readAll(spark, out).count() == before,
      "a redelivered epoch double-landed rows")
  }

  test("a same-id re-upload of landed content is a dedup drop, not a second append") {
    // doc 900's exact bytes arrive again UNDER ITS OWN ID: the
    // different-doc match filter can't see it (id == dup_of), but the
    // layout is append-only, so landing it would duplicate doc_id 900.
    // curateBatch drops on fingerprint presence alone.
    val idx = StreamAudioDedup.fingerprintIndex(corpus)
    val rearrival = Seq((900L, wav("landed-song-a"))).toDF("doc_id", "content")
    val admitted = StreamAudioDedup.curateBatch(rearrival, idx)
      .select("doc_id").as[Long].collect()
    assert(admitted.isEmpty,
      s"same-id re-upload must not re-land into the append-only layout: ${admitted.toSeq}")
    // and the match REPORT stays different-doc only: a self-match row
    // would read as '900 duplicates 900' to the report consumer
    val selfMatch = StreamAudioDedup.matchedStream(rearrival, idx)
      .select("doc_id").as[Long].collect()
    assert(selfMatch.isEmpty, "matchedStream must not report a doc as its own duplicate")
  }

  test("fingerprint index keeps EVERY fingerprint: the first re-arrival of a unique payload is caught") {
    // mm_audio_dedup only reports already-duplicated groups; the probe
    // index must also hold singleton fingerprints or the first
    // re-upload of a unique landed payload slips through
    val idx = StreamAudioDedup.fingerprintIndex(corpus)
    assert(idx.count() == 2, "both landed payloads must be indexed, duplicated or not")
    val rematch = StreamAudioDedup.matchedStream(
        Seq((5L, wav("landed-song-b"))).toDF("doc_id", "content"), idx)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(rematch == Set((5L, 901L)), s"singleton-fingerprint re-upload missed: $rematch")
  }
}
