package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries
import graft.streaming.StreamVectorIndex

/** Continuous IVF maintenance: a live-streamed index must agree
  * row-for-row with the batch build, serve the SAME probe results
  * through the unchanged batch query path, land exactly-once under
  * redelivery, and stay correct across compaction. */
class StreamVectorIndexSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-vecindex-spec")
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def tmpDir() =
    Files.createTempDirectory("stream-vecindex").toFile.getAbsolutePath

  private def corpus() = {
    graft.functions.VectorFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings")
  }

  test("stream-built index ≡ batch-built index, and the batch query path serves it unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val vecs = corpus()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val out = tmpDir()
    val cp = tmpDir()

    // feed the corpus through a stream in two arbitrary halves
    val rows = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamVectorIndex.start(
      input.toDF().toDF("vec_id", "embedding"), cents, out, cp)
    input.addData(h1.toSeq: _*); q.processAllAvailable()
    input.addData(h2.toSeq: _*); q.processAllAvailable()
    q.stop()

    // row-for-row assignment parity with the batch build
    val streamed = StreamVectorIndex.readIndex(spark, out)
      .select(col("vec_id"), col("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = VectorQueries.assignNearest(vecs, cents)
      .select(col("vec_id"), col("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size} rows")
    assert(streamed == batch, "stream and batch assignments diverge")

    // the UNCHANGED batch probe path over the streamed index must equal
    // the oracle-gated self-contained query
    val viaStream = VectorQueries
      .probeLists(vecs, cents, StreamVectorIndex.readIndex(spark, out))
      .collect().map(_.toString).sorted
    val direct = SparkEntry.queries("vec_ivf_topk")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(viaStream.sameElements(direct), "probe results diverge over the streamed index")

    // manifest covers every row without scanning data
    assert(StreamVectorIndex.manifest(out).values.sum == rows.length.toLong)
  }

  test("redelivered epoch is a no-op; compaction preserves the index and the query result") {
    val vecs = corpus()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val idx = StreamVectorIndex.listIndex(cents)
    val out = tmpDir()

    val half1 = vecs.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
    val half2 = vecs.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
    assert(StreamVectorIndex.commitBatch(half1, cents, idx, out, epochId = 0L))
    assert(StreamVectorIndex.commitBatch(half2, cents, idx, out, epochId = 1L))
    val n = vecs.count()
    assert(StreamVectorIndex.readIndex(spark, out).count() == n)

    // redelivery of a committed epoch must change nothing
    assert(!StreamVectorIndex.commitBatch(half1, cents, idx, out, epochId = 0L))
    assert(StreamVectorIndex.readIndex(spark, out).count() == n)

    // a partition-pruned single-list read matches the full-read filter
    val someCent = idx.keys.min
    val pruned = StreamVectorIndex.readList(spark, out, idx, someCent).count()
    val full = StreamVectorIndex.readIndex(spark, out)
      .filter(col("cent_id") === someCent).count()
    assert(pruned == full && pruned > 0, s"list read: $pruned vs $full")

    // compaction folds epochs; rows and probe results must be unchanged
    val before = VectorQueries
      .probeLists(vecs, cents, StreamVectorIndex.readIndex(spark, out))
      .collect().map(_.toString).sorted
    assert(StreamVectorIndex.compact(spark, out, idx).isDefined)
    assert(StreamVectorIndex.readIndex(spark, out).count() == n, "compaction changed row count")
    val after = VectorQueries
      .probeLists(vecs, cents, StreamVectorIndex.readIndex(spark, out))
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction changed probe results")
  }
}
