package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries
import graft.streaming.StreamGraphIndex

/** Continuous neighbor-graph maintenance: a live-streamed adjacency
  * must agree edge-for-edge with the batch build (top-k merge
  * associativity is the load-bearing claim — existing nodes' lists must
  * IMPROVE as better neighbors arrive), serve the unchanged beam-search
  * walk, and land exactly-once under redelivery. */
class StreamGraphIndexSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-graphindex-spec")
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Buckets = 4

  private def tmpDir() =
    Files.createTempDirectory("stream-graphindex").toFile.getAbsolutePath

  private def corpus() = {
    graft.functions.VectorFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("src"), col("dst")).as[(Long, Long)].collect().toSet

  test("stream-built graph ≡ batch-built graph, and the unchanged beam walk serves it") {
    implicit val sqlCtx = spark.sqlContext
    val vecs = corpus()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val dir = tmpDir()
    val cp = tmpDir()

    // feed the corpus in two arbitrary halves: the second epoch must
    // both build the new nodes AND retro-fit better neighbors onto the
    // first epoch's nodes
    val rows = vecs.as[(Long, Array[Float])].collect()
    val (h1, h2) = rows.partition(_._1 % 2 == 0)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamGraphIndex.start(
      input.toDF().toDF("vec_id", "embedding"), cents, dir, Buckets, cp)
    input.addData(h1.toSeq: _*); q.processAllAvailable()
    input.addData(h2.toSeq: _*); q.processAllAvailable()
    q.stop()

    val streamed = edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets))
    val batch = edgeSet(VectorQueries.graphAdjacency(vecs))
    assert(streamed == batch,
      s"adjacency diverged: ${(streamed -- batch).size} extra, ${(batch -- streamed).size} missing")

    // the UNCHANGED beam-search walk over the maintained graph must
    // equal the oracle-gated self-contained query
    val viaStream = VectorQueries.graphBeamSearch(
        Tables.load(spark, sfDir, "embeddings"),
        StreamGraphIndex.readAdjacency(spark, dir, Buckets))
      .collect().map(_.toString).sorted
    val direct = SparkEntry.queries("vec_graph_topk")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(viaStream.sameElements(direct), "beam results diverge over the streamed graph")
  }

  test("redelivered epoch is a no-op; single-epoch build ≡ batch build") {
    val vecs = corpus()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val idx = graft.streaming.StreamVectorIndex.listIndex(cents)
    val dir = tmpDir()

    val h1 = vecs.filter(col("vec_id") % 2 === 0)
    val h2 = vecs.filter(col("vec_id") % 2 === 1)
    assert(StreamGraphIndex.applyBatch(h1, cents, idx, dir, Buckets, epochId = 0L))
    assert(StreamGraphIndex.applyBatch(h2, cents, idx, dir, Buckets, epochId = 1L))
    val after = edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets))

    // redelivery of BOTH epochs must change nothing
    assert(!StreamGraphIndex.applyBatch(h1, cents, idx, dir, Buckets, epochId = 0L))
    assert(!StreamGraphIndex.applyBatch(h2, cents, idx, dir, Buckets, epochId = 1L))
    assert(edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets)) == after)

    // one-shot ingest agrees with the batch build too (epoch boundaries
    // are an implementation detail, not a semantic one)
    val dir2 = tmpDir()
    assert(StreamGraphIndex.applyBatch(vecs, cents, idx, dir2, Buckets, epochId = 0L))
    assert(edgeSet(StreamGraphIndex.readAdjacency(spark, dir2, Buckets)) ==
      edgeSet(VectorQueries.graphAdjacency(vecs)))
  }

  test("crash between the membership land and the adjacency merge: replay converges to the batch-built graph") {
    import graft.tools.Failpoints
    val vecs = corpus()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val idx = graft.streaming.StreamVectorIndex.listIndex(cents)
    val dir = tmpDir()

    val h1 = vecs.filter(col("vec_id") % 2 === 0)
    val h2 = vecs.filter(col("vec_id") % 2 === 1)
    assert(StreamGraphIndex.applyBatch(h1, cents, idx, dir, Buckets, epochId = 0L))
    val graph0 = edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets))

    // kill the job between land 1 (epoch-1 membership committed) and
    // land 2 (the adjacency merge whose version id IS the epoch marker)
    Failpoints.arm("graph.between-lands")
    intercept[Failpoints.InjectedCrash] {
      StreamGraphIndex.applyBatch(h2, cents, idx, dir, Buckets, epochId = 1L)
    }
    // the walkable graph must not tear mid-crash: adjacency is still
    // exactly the epoch-0 state
    assert(edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets)) == graph0,
      "a crash between the two lands leaked half an epoch into the adjacency")

    // the replayed epoch re-lands membership as a marker no-op, reads
    // back the rows the crashed attempt wrote, and must converge to the
    // batch-built graph over the full corpus
    assert(StreamGraphIndex.applyBatch(h2, cents, idx, dir, Buckets, epochId = 1L),
      "the replayed epoch must commit")
    val streamed = edgeSet(StreamGraphIndex.readAdjacency(spark, dir, Buckets))
    val batch = edgeSet(VectorQueries.graphAdjacency(vecs))
    assert(streamed == batch,
      s"replay did not converge: ${(streamed -- batch).size} extra, ${(batch -- streamed).size} missing")
  }
}
