package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamShardedExport

/** Compaction over the continuous sharded export: folding epochs into a
  * generation must preserve every row and every shard assignment,
  * collapse the file count, survive the crash window between marker
  * publish and GC without double-reading, fold recursively across
  * generations, and never disturb epochs committed while it ran. */
class StreamCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "compact-spec")

  private val Shards = 4

  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"doc-$i")).toDF("doc_id", "text")
  }

  private def newDir(): String =
    Files.createTempDirectory("compact-spec").toString

  private def commit(dir: String, epoch: Long, ids: Range): Unit =
    assert(StreamShardedExport.commitBatch(docs(ids), "doc_id", dir, Shards, epoch))

  private def readIds(dir: String): Seq[Long] = {
    import spark.implicits._
    StreamShardedExport.readAll(spark, dir).select("doc_id").as[Long]
      .collect().sorted.toSeq
  }

  private def shardMap(dir: String): Map[Int, Seq[Long]] = {
    import spark.implicits._
    (0 until Shards).map { s =>
      s -> StreamShardedExport.readShard(spark, dir, s)
        .select("doc_id").as[Long].collect().sorted.toSeq
    }.toMap
  }

  private def parquetFiles(dir: String): Seq[Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq

  test("compact preserves rows, shard assignment, and manifest; collapses files") {
    val dir = newDir()
    commit(dir, 0, 0 until 40)
    commit(dir, 1, 40 until 90)
    commit(dir, 2, 90 until 100)
    val before = readIds(dir)
    val beforeShards = shardMap(dir)
    val beforeManifest = StreamShardedExport.manifest(dir)
    val beforeFiles = parquetFiles(dir).size

    val gen = StreamShardedExport.compact(spark, dir, Shards)
    assert(gen.contains(0L))
    assert(readIds(dir) == before)
    assert(shardMap(dir) == beforeShards)
    assert(StreamShardedExport.manifest(dir) == beforeManifest)
    val afterFiles = parquetFiles(dir).size
    assert(afterFiles < beforeFiles,
      s"expected fewer files after compaction: $beforeFiles -> $afterFiles")
    assert(afterFiles <= Shards)
    // folded epochs are gone from disk
    assert(StreamShardedExport.committedEpochs(dir).isEmpty)
  }

  test("crash window: marker published, GC not yet run — no double rows") {
    val dir = newDir()
    commit(dir, 0, 0 until 30)
    commit(dir, 1, 30 until 60)
    val before = readIds(dir)
    // gc=false simulates a crash after the marker publish
    assert(StreamShardedExport.compact(spark, dir, Shards, gc = false).contains(0L))
    // folded batch dirs AND markers still on disk...
    assert(StreamShardedExport.committedEpochs(dir).nonEmpty)
    // ...but visibility is marker algebra: reads see each row once
    assert(readIds(dir) == before)
    assert(StreamShardedExport.manifest(dir).values.sum == before.size)
    // the idempotent sweep finishes the job
    StreamShardedExport.gcFolded(dir)
    assert(StreamShardedExport.committedEpochs(dir).isEmpty)
    assert(readIds(dir) == before)
  }

  test("epochs committed during compaction stay visible; next compact folds them and the old gen") {
    val dir = newDir()
    commit(dir, 0, 0 until 25)
    commit(dir, 1, 25 until 50)
    assert(StreamShardedExport.compact(spark, dir, Shards).contains(0L))
    commit(dir, 2, 50 until 75) // "live stream" continues after the fold
    assert(readIds(dir) == (0L until 75L))
    val gen2 = StreamShardedExport.compact(spark, dir, Shards)
    assert(gen2.contains(1L))
    assert(readIds(dir) == (0L until 75L))
    assert(StreamShardedExport.committedEpochs(dir).isEmpty)
    assert(StreamShardedExport.committedGenerations(dir) == Seq(1L))
    assert(parquetFiles(dir).size <= Shards)
  }

  test("live stream with compactEvery folds epochs as it runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = newDir()
    val cp = newDir()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamShardedExport.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", out,
      numShards = Shards, checkpoint = cp, compactEvery = 2)
    try {
      (0 until 4).foreach { b =>
        input.addData((b * 50 until (b + 1) * 50).map(i => (i.toLong, s"doc $i")): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // 4 epochs at compactEvery=2 → compactions ran; all rows intact
    assert(StreamShardedExport.committedGenerations(out).nonEmpty,
      "no compaction ran during the stream")
    assert(readIds(out) == (0L until 200L))
    assert(StreamShardedExport.manifest(out).values.sum == 200)
    // the last fold collapsed everything committed up to it: at most one
    // uncompacted epoch tail remains per shard on top of the generation
    assert(parquetFiles(out).size <= 2 * Shards,
      s"expected ≤ ${2 * Shards} files after in-stream folding, got ${parquetFiles(out).size}")
  }

  test("nothing to fold: single commit or empty dir returns None") {
    val dir = newDir()
    assert(StreamShardedExport.compact(spark, dir, Shards).isEmpty)
    commit(dir, 0, 0 until 10)
    assert(StreamShardedExport.compact(spark, dir, Shards).isEmpty)
    assert(readIds(dir) == (0L until 10L))
  }

  test("a live rival's claim makes compact back off; a stale claim is stolen") {
    val dir = newDir()
    commit(dir, 0, 0 until 10)
    commit(dir, 1, 10 until 20)
    // a rival holds the claim for the generation this compact would take
    val claim = Paths.get(dir, ".compact-0.claim")
    Files.createFile(claim)
    assert(StreamShardedExport.compact(spark, dir, Shards).isEmpty,
      "compact ran despite a live rival claim")
    assert(Files.exists(claim), "loser deleted the rival's claim")
    assert(readIds(dir) == (0L until 20L), "backed-off compact disturbed data")
    // the rival crashed: age the claim past the TTL — the next compact
    // steals it and completes
    Files.setLastModifiedTime(claim, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - StreamShardedExport.ClaimTtlMs - 1000))
    assert(StreamShardedExport.compact(spark, dir, Shards).contains(0L))
    assert(readIds(dir) == (0L until 20L))
    assert(!Files.exists(claim), "winner left its claim behind")
  }
}
