package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{RetrievalQueries, VectorQueries}
import graft.snapshot.TargetTable
import graft.streaming._
import graft.tools.ScaleAudit

/** CI scale gate for the CONTINUOUS faces — the batch `ScaleAuditSpec`
  * extended to one epoch of the heaviest streaming pipelines, so the
  * "bounded per-epoch cost / bounded state" claims are enforced, not
  * narrated:
  *
  *  - PER-EPOCH SHUFFLE ceilings (absolute bytes at sf0.01, the
  *    batch-gate rationale: plan regressions jump these 10-50×, so
  *    ceilings carry ~4-8× headroom over measured values): a steady-
  *    state epoch of the graph index, the bitext index, and the
  *    lexical index must cost batch-and-cell-sized work, never a
  *    corpus rebuild.
  *  - STATE-ROW exactness from `StateOperatorProgress`: the pack-atomic
  *    face holds exactly |shards| state rows, the frame-neardup face
  *    exactly the batch's distinct candidate pairs — counted by the
  *    engine, not asserted from the design doc.
  *  - A canary proves the state meter catches the failure mode it
  *    guards: an unwatermarked distinct's state GROWS with the stream.
  */
class StreamScaleAuditSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-scale-audit-spec")
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private val MB = 1048576.0
  private val Buckets = 4

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("stream-scale").toFile.getAbsolutePath

  private def gate(name: String, m: graft.tools.AuditMetrics,
      swCapMb: Double, taskCapMb: Double): Seq[String] = {
    val sw = m.shuffleWrite / MB
    val mt = m.maxTaskSw / MB
    info(f"$name%-34s shufWr $sw%6.2f MB (cap $swCapMb) maxTaskSw $mt%6.2f MB (cap $taskCapMb)")
    (if (sw > swCapMb)
      Seq(f"$name epoch shuffle-write $sw%.2f MB exceeds ceiling $swCapMb MB — a corpus-sized epoch?")
    else Nil) ++
    (if (mt > taskCapMb)
      Seq(f"$name epoch max-task shuffle $mt%.2f MB exceeds ceiling $taskCapMb MB — a hot-keyed exchange?")
    else Nil)
  }

  test("steady-state epochs of the graph, bitext, and lexical indexes stay under their shuffle ceilings") {
    graft.functions.VectorFunctions.register(spark)
    val failures = Seq.newBuilder[String]

    // graph index: prime with the full corpus (the build epoch, billed
    // to maintenance), then meter a 25-vector arrival epoch — cost must
    // be batch × cell-members scoring + touched-bucket rewrite
    locally {
      val vecs = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = VectorQueries.sampledCentroids(vecs).cache()
      val idx = StreamVectorIndex.listIndex(cents)
      val dir = tmpDir()
      StreamGraphIndex.applyBatch(vecs, cents, idx, dir, Buckets, epochId = 0L)
      val arrivals = vecs.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val m = ScaleAudit.measure(spark) {
        StreamGraphIndex.applyBatch(arrivals, cents, idx, dir, Buckets, epochId = 1L)
        ()
      }
      failures ++= gate("StreamGraphIndex.applyBatch", m, 4.0, 1.5) // measured 1.71 / 0.64 MB
    }

    // bitext index: prime with 50 de docs, meter a 20-doc epoch — one
    // broadcast of the batch into one en scan + an en-sized rewrite
    locally {
      val docs = Tables.load(spark, sfDir, "documents")
      val en = docs.filter(col("lang") === "en")
        .select(col("doc_id").as("a_id"), RetrievalQueries.bitextEmb(col("text")).as("ea"))
        .localCheckpoint(true)
      val de = docs.filter(col("lang") === "de")
        .select(col("doc_id").as("b_id"), RetrievalQueries.bitextEmb(col("text")).as("eb"))
        .localCheckpoint(true)
      val deRows = de.as[(Long, Array[Float])].collect()
      val dir = tmpDir()
      def frame(rows: Array[(Long, Array[Float])]) =
        rows.toSeq.toDF("b_id", "eb")
      StreamBitextIndex.applyBatch(frame(deRows.take(50)), en, dir, Buckets, epochId = 0L)
      val m = ScaleAudit.measure(spark) {
        StreamBitextIndex.applyBatch(frame(deRows.slice(50, 70)), en, dir, Buckets, epochId = 1L)
        ()
      }
      failures ++= gate("StreamBitextIndex.applyBatch", m, 0.2, 0.1) // measured 0.02 / 0.01 MB
      // the "en-sized, never pair-space-sized" state claim, counted:
      // one top-k row per en doc, independent of how many de docs landed
      val stateRows = new TargetTable(spark, s"$dir/en_topk", Seq("a_id"), Buckets)
        .read().count()
      assert(stateRows == en.count(),
        s"bitext en-side state is $stateRows rows for ${en.count()} en docs — not en-sized")
    }

    // lexical index: meter one 100-doc epoch — postings of the BATCH
    // only (tokenize + per-term partial counts), never a re-index
    locally {
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")).limit(100).localCheckpoint(true)
      val dir = tmpDir()
      val m = ScaleAudit.measure(spark) {
        StreamLexicalIndex.commitBatch(docs, dir, epochId = 0L)
        ()
      }
      failures ++= gate("StreamLexicalIndex.commitBatch", m, 0.3, 0.15) // measured 0.04 / 0.04 MB
    }

    assert(failures.result().isEmpty, failures.result().mkString("\n"))
  }

  test("stateful faces hold exactly the state their contracts claim, counted by StateOperatorProgress") {
    implicit val sqlCtx = spark.sqlContext

    // pack-atomic: state is TWO longs per shard — numRowsTotal must be
    // exactly |shards| regardless of how many docs flowed through
    locally {
      val input = MemoryStream[StreamPackAtomic.Doc]
      val q = StreamPackAtomic.pack(input.toDS(), budget = 512L)
        .writeStream.format("memory").queryName("audit_pack")
        .outputMode("append").start()
      input.addData((0L until 200L).map(i => StreamPackAtomic.Doc(i, i % 7, 100L + i % 50)): _*)
      q.processAllAvailable()
      input.addData((200L until 400L).map(i => StreamPackAtomic.Doc(i, i % 7, 100L + i % 50)): _*)
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"StreamPackAtomic state rows: $stateRows (shards: 7, docs: 400)")
      assert(stateRows == 7L,
        s"pack-atomic state must be |shards| = 7 rows after 400 docs, got $stateRows")
    }

    // frame-neardup: the only state is the watermarked candidate-pair
    // dedup — numRowsTotal must equal the batch's DISTINCT candidate
    // (doc, corpus-match) pairs, not the corpus and not the raw
    // fingerprint-hit multiset
    locally {
      val corpus = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      val index = graft.multimodal.FrameNeardupIndex.build(corpus)
      // re-uploads of existing payloads guarantee candidates
      val uploads = corpus.limit(10).as[(Long, Array[Byte])].collect()
        .map { case (id, c) => MediaUpload(id + 10000L, new Timestamp(1000L), c) }
      val expectedPairs = corpus.limit(10)
        .select((col("doc_id") + 10000L).as("doc_id"),
          explode(graft.multimodal.FrameNeardupIndex.rowFrameFps(col("content"))).as("frame_fp"))
        .join(index.frames.select(col("frame_fp"), col("doc_id").as("dup_of")), Seq("frame_fp"))
        .select(col("doc_id"), col("dup_of")).distinct().count()
      val input = MemoryStream[MediaUpload]
      val q = StreamFrameNeardup.matchedStream(input.toDF(), index)
        .writeStream.format("memory").queryName("audit_frame_nd")
        .outputMode("append").start()
      input.addData(uploads.toSeq: _*)
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"StreamFrameNeardup state rows: $stateRows (expected candidate pairs: $expectedPairs)")
      assert(expectedPairs > 0, "fixture degenerate: re-uploads produced no candidates")
      assert(stateRows == expectedPairs,
        s"frame-neardup state is $stateRows rows, batch has $expectedPairs distinct candidate pairs")
    }
  }

  test("per-key stateful faces hold exactly one state row per key: transitions, domain cap, sessionize") {
    // the remaining flatMapGroupsWithState faces' "one tiny state row
    // per key" contracts, counted: 400 events over 23 users leave 23
    // rows (last event each), 300 docs over 11 domains leave 11 rows
    // (admission counters), and open sessions hold one row per user —
    // none of them scale with the EVENT count
    implicit val sqlCtx = spark.sqlContext

    locally {
      val input = MemoryStream[StreamTransitions.Ev]
      val q = StreamTransitions.transitions(input.toDS())
        .writeStream.format("memory").queryName("audit_trans")
        .outputMode("append").start()
      input.addData((0L until 400L).map(i =>
        StreamTransitions.Ev(i % 23, s"t${i % 3}", i * 1000L, i)): _*)
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"StreamTransitions state rows: $rows (users: 23, events: 400)")
      assert(rows == 23L, s"transitions state must be one row per user, got $rows")
    }

    locally {
      val input = MemoryStream[StreamDomainCap.Doc]
      val q = StreamDomainCap.admit(input.toDS(), cap = 5L)
        .writeStream.format("memory").queryName("audit_domcap")
        .outputMode("append").start()
      input.addData((0L until 300L).map(i =>
        StreamDomainCap.Doc(i, s"d${i % 11}.example")): _*)
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"StreamDomainCap state rows: $rows (domains: 11, docs: 300)")
      assert(rows == 11L, s"domain-cap state must be one counter per domain, got $rows")
    }

    locally {
      val input = MemoryStream[StreamSessionize.Event]
      val q = StreamSessionize.sessions(
          input.toDS().withWatermark("ts", "0 seconds"), gapMs = 60000L)
        .writeStream.format("memory").queryName("audit_sess")
        .outputMode("append").start()
      input.addData((0L until 200L).map(i =>
        StreamSessionize.Event(i % 13, new Timestamp(1000L + i), 1.0)): _*)
      q.processAllAvailable()
      val rows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      info(s"StreamSessionize state rows: $rows (users: 13, events: 200)")
      assert(rows == 13L, s"sessionize state must be one open session per user, got $rows")
    }
  }

  test("StreamDedup state is exactly the horizon's distinct content hashes, not the row count") {
    // the watermarked-dedup family's bounded-state contract, counted:
    // 300 rows carrying 40 distinct normalized texts leave exactly 40
    // state rows — content-hash-keyed, never row-keyed
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamDedup.dedupedStream(
        input.toDF().toDF("ingest_ts", "text"), horizon = "1 hour")
      .writeStream.format("memory").queryName("audit_dedup")
      .outputMode("append").start()
    input.addData((0 until 300).map(i =>
      (new Timestamp(1000L + i), s"document body number ${i % 40}")): _*)
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val emitted = spark.table("audit_dedup").count()
    q.stop()
    info(s"StreamDedup state rows: $stateRows (distinct texts: 40, rows: 300, emitted: $emitted)")
    assert(stateRows == 40L, s"dedup state must be one row per content hash, got $stateRows")
    assert(emitted == 40L, s"first-occurrence contract: 40 docs must emit, got $emitted")
  }

  test("canary: an unwatermarked distinct's state grows with the stream — the meter sees it") {
    // the state gate is only as good as its meter: a face that keys
    // state on an unbounded set must show MONOTONE GROWTH in
    // numRowsTotal across epochs — exactly the signature the exact
    // counts above would catch on a regressed face
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("id").dropDuplicates("id")
      .writeStream.format("memory").queryName("audit_canary")
      .outputMode("append").start()
    input.addData(0L until 100L: _*)
    q.processAllAvailable()
    val after1 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    input.addData(100L until 250L: _*)
    q.processAllAvailable()
    val after2 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    info(s"canary state rows: $after1 -> $after2")
    assert(after1 == 100L && after2 == 250L,
      s"state meter lost rows: $after1 -> $after2 (want 100 -> 250)")
  }
}
