package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.ShardedExport

/** Sharded training export: deterministic assignment, disjoint cover,
  * manifest agreement, atomic re-export. */
class ShardedExportSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "sharded-export-spec")
  import spark.implicits._

  test("shards cover the input disjointly and the manifest matches") {
    val dir = Files.createTempDirectory("graft-shards").resolve("corpus").toString
    val docs = (1L to 1000L).map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    val m = ShardedExport.writeShards(docs, "doc_id", dir, numShards = 8)

    assert(m.numShards == 8 && m.totalRows == 1000L)
    assert(m.rowsPerShard.values.sum == 1000L)
    assert(m.rowsPerShard.keys.forall(k => k >= 0 && k < 8))
    // hash-balance: no empty shard, no shard hogging the corpus
    assert(m.rowsPerShard.values.forall(n => n > 50 && n < 250), m.rowsPerShard.toString)

    // disjoint cover: every doc id in exactly one shard
    val all = (0 until 8).flatMap { s =>
      ShardedExport.readShard(spark, dir, s).select("doc_id").as[Long].collect()
    }
    assert(all.size == 1000 && all.toSet.size == 1000)

    // manifest round-trips
    assert(ShardedExport.readManifest(dir) == m)
  }

  test("jsonl export: same shard map as parquet, line-readable files") {
    val base = Files.createTempDirectory("graft-jsonl")
    val docs = (1L to 300L).map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    val mp = ShardedExport.writeShards(docs, "doc_id", base.resolve("pq").toString, 4)
    val mj = ShardedExport.writeShards(docs, "doc_id", base.resolve("js").toString, 4, "json")
    assert(mj == mp, "jsonl manifest diverges from parquet manifest")
    (0 until 4).foreach { s =>
      val pq = ShardedExport.readShard(spark, base.resolve("pq").toString, s)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val js = ShardedExport.readShard(spark, base.resolve("js").toString, s, "json")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(js == pq, s"shard $s key set diverges across formats")
    }
    // the files really are line-delimited JSON a non-Spark loader can read
    val aFile = Files.walk(base.resolve("js")).iterator()
    val jsonFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(aFile).asScala
      .filter(p => p.getFileName.toString.endsWith(".json")).toList
    assert(jsonFiles.nonEmpty)
    val firstLine = Files.readAllLines(jsonFiles.head).get(0)
    assert(firstLine.startsWith("{") && firstLine.contains("\"doc_id\""), firstLine)
  }

  test("re-export is deterministic: same rows land in the same shards") {
    val base = Files.createTempDirectory("graft-shards-det")
    val docs = (1L to 500L).map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    val m1 = ShardedExport.writeShards(docs, "doc_id", base.resolve("a").toString, 4)
    val m2 = ShardedExport.writeShards(docs, "doc_id", base.resolve("b").toString, 4)
    assert(m1 == m2)
    (0 until 4).foreach { s =>
      val a = ShardedExport.readShard(spark, base.resolve("a").toString, s)
        .select("doc_id").as[Long].collect().toSet
      val b = ShardedExport.readShard(spark, base.resolve("b").toString, s)
        .select("doc_id").as[Long].collect().toSet
      assert(a == b, s"shard $s differs between identical exports")
    }
    // re-export over an existing dir swaps atomically (no stale merge)
    val m3 = ShardedExport.writeShards(docs.limit(100), "doc_id", base.resolve("a").toString, 4)
    assert(m3.totalRows == 100L)
    assert(ShardedExport.readManifest(base.resolve("a").toString).totalRows == 100L)
    assert(Files.exists(Paths.get(base.resolve("a").toString, "_manifest.json")))
  }
}
