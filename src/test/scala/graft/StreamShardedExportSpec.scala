package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.ShardedExport
import graft.streaming.StreamShardedExport

/** Exactly-once continuous sharded export: batches land idempotently
  * under redelivery, readers see only committed batches, and the stream
  * places every key in the same shard as the batch exporter. */
class StreamShardedExportSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-export-spec")
  import spark.implicits._

  private def tmpDir() =
    Files.createTempDirectory("stream-export").toFile.getAbsolutePath

  test("a live stream lands batches exactly-once; redelivery of a committed epoch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmpDir()
    val cp = tmpDir()
    val input = MemoryStream[(Long, String)]
    val q = StreamShardedExport.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", out, numShards = 4, checkpoint = cp)

    input.addData((0L until 100L).map(i => (i, s"doc $i")): _*)
    q.processAllAvailable()
    input.addData((100L until 150L).map(i => (i, s"doc $i")): _*)
    q.processAllAvailable()
    q.stop()

    val epochs = StreamShardedExport.committedEpochs(out)
    assert(epochs.nonEmpty, "no committed epochs")
    assert(StreamShardedExport.readAll(spark, out).count() == 150)

    // failure redelivery: the SAME epoch id arrives again with the same
    // rows — the commit must be a no-op, never a duplicate
    val replay = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val wrote = StreamShardedExport.commitBatch(replay, "doc_id", out, 4, epochs.head)
    assert(!wrote, "redelivered epoch must be skipped")
    assert(StreamShardedExport.readAll(spark, out).count() == 150,
      "redelivery duplicated rows")
    assert(StreamShardedExport.manifest(out).values.sum == 150)
  }

  test("stream sharding matches batch sharding key-for-key; uncommitted orphans stay invisible") {
    val out = tmpDir()
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    assert(StreamShardedExport.commitBatch(docs, "doc_id", out, 4, epochId = 0L))

    // batch exporter over the same rows: every key must land in the
    // same shard (same pure hash), so one shard→worker map serves both
    val batchOut = tmpDir()
    ShardedExport.writeShards(docs, "doc_id", batchOut, 4)
    (0 until 4).foreach { s =>
      val streamIds = StreamShardedExport.readShard(spark, out, s)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val batchIds = ShardedExport.readShard(spark, batchOut, s)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamIds == batchIds, s"shard $s diverges between stream and batch")
    }

    // an orphan data dir WITHOUT a marker (crash between rename and
    // marker write) must not be readable
    val orphan = docs.limit(10)
      .withColumn("_shard", pmod(hash(col("doc_id")), lit(4)))
    orphan.write.partitionBy("_shard").parquet(s"$out/batch=99")
    assert(!StreamShardedExport.committedEpochs(out).contains(99L))
    assert(StreamShardedExport.readAll(spark, out).count() == 200,
      "orphan batch leaked into the committed read")
  }

  test("crash injection: failures after the tmp write and between rename and marker both replay to exactly-once") {
    import graft.tools.Failpoints
    val out = tmpDir()
    def docs(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    assert(StreamShardedExport.commitBatch(docs(0, 40), "doc_id", out, 4, 0L))

    // gap 1: shard files fully written, nothing renamed, no marker —
    // the orphan .tmp dir must be invisible and the replay must land
    Failpoints.arm("sharded.after-tmp-write")
    intercept[Failpoints.InjectedCrash] {
      StreamShardedExport.commitBatch(docs(40, 80), "doc_id", out, 4, 1L)
    }
    assert(!StreamShardedExport.committedEpochs(out).contains(1L),
      "a crash before any publish must not commit the epoch")
    assert(StreamShardedExport.readAll(spark, out).count() == 40,
      "the orphan tmp write leaked into the committed read")
    assert(StreamShardedExport.commitBatch(docs(40, 80), "doc_id", out, 4, 1L),
      "the replay of the crashed epoch must land")
    assert(StreamShardedExport.readAll(spark, out).count() == 80)

    // gap 2: data dir renamed into place but the marker write never
    // ran — readers exclude the orphan dest; the replay OVERWRITES it
    // (not appends beside it) and publishes, so rows count once
    Failpoints.arm("sharded.before-marker")
    intercept[Failpoints.InjectedCrash] {
      StreamShardedExport.commitBatch(docs(80, 120), "doc_id", out, 4, 2L)
    }
    assert(Files.isDirectory(java.nio.file.Paths.get(out, "batch=2")),
      "fixture: the crash must land AFTER the dest rename")
    assert(!StreamShardedExport.committedEpochs(out).contains(2L))
    assert(StreamShardedExport.readAll(spark, out).count() == 80,
      "an unmarked dest dir leaked into the committed read")
    assert(StreamShardedExport.commitBatch(docs(80, 120), "doc_id", out, 4, 2L))
    assert(StreamShardedExport.readAll(spark, out).count() == 120,
      "replay over the orphan dest double-landed or lost rows")
    assert(StreamShardedExport.manifest(out).values.sum == 120)
  }

  test("empty micro-batches commit marker-only and never wedge the stream; stray marker files are ignored") {
    val out = tmpDir()
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // an empty batch (routine in production) must commit, not crash on
    // a schemaless parquet read — and redeliver as a no-op
    assert(StreamShardedExport.commitBatch(docs.limit(0), "doc_id", out, 4, epochId = 0L))
    assert(!StreamShardedExport.commitBatch(docs.limit(0), "doc_id", out, 4, epochId = 0L))
    assert(StreamShardedExport.committedEpochs(out) == Seq(0L))
    assert(StreamShardedExport.manifest(out).isEmpty)

    assert(StreamShardedExport.commitBatch(docs, "doc_id", out, 4, epochId = 1L))
    assert(StreamShardedExport.readAll(spark, out).count() == 50,
      "marker-only epoch must contribute zero rows, not break the read")

    // a stray non-numeric file in _committed must not break every read
    Files.writeString(java.nio.file.Paths.get(out, "_committed", "notes.json"), "{}")
    assert(StreamShardedExport.committedEpochs(out) == Seq(0L, 1L))
    assert(StreamShardedExport.readAll(spark, out).count() == 50)
    assert(StreamShardedExport.manifest(out).values.sum == 50)
  }
}
