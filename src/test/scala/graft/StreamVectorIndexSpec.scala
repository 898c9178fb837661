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

  test("drift-triggered retrain: old generation serves until the atomic swap; crash between land and swap replays clean") {
    val vecs = corpus().select(col("vec_id"), col("embedding"))
    val root = tmpDir()
    val cents0 = VectorQueries.sampledCentroids(vecs).cache()
    StreamVectorIndex.initIndex(vecs, cents0, root)
    assert(StreamVectorIndex.currentGen(root).contains(0L))
    assert(StreamVectorIndex.driftScore(root) == 0.0, "no arrivals, no drift")

    // IN-distribution arrivals (exact copies under fresh ids): the
    // per-list proportions match the baseline exactly, so chi-squared is
    // ~0 and retrain must no-op
    val inDist = vecs.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    assert(StreamVectorIndex.commitBatchCurrent(inDist, spark, root, epochId = 1L))
    val lowDrift = StreamVectorIndex.driftScore(root)
    assert(lowDrift < 1.0, s"in-distribution arrivals read as drift: $lowDrift")
    assert(StreamVectorIndex.retrainIfDrifted(spark, root, threshold = 10.0,
      seedStride = 25).isEmpty, "retrain must not fire below the threshold")

    // OUT-of-distribution arrivals: negated embeddings — a cluster the
    // old quantizer has no resolution for (every one crams into the
    // least-dissimilar cell or two)
    val drifted = vecs.select((col("vec_id") + 200000L).as("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    assert(StreamVectorIndex.commitBatchCurrent(drifted, spark, root, epochId = 2L))
    val highDrift = StreamVectorIndex.driftScore(root)
    assert(highDrift > 10.0, s"drifted arrivals must exceed the threshold: $highDrift")
    val totalRows = StreamVectorIndex.readCurrentIndex(spark, root).count()

    // crash between the new generation's land and the pointer swap: the
    // OLD generation keeps serving, untorn
    graft.tools.Failpoints.arm("vecindex.before-swap")
    intercept[graft.tools.Failpoints.InjectedCrash] {
      StreamVectorIndex.retrainIfDrifted(spark, root, 10.0, seedStride = 25,
        eps = 1e-3)
    }
    assert(StreamVectorIndex.currentGen(root).contains(0L),
      "a crash before the swap must leave the old generation serving")
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == totalRows,
      "the serving index tore under the crashed retrain")

    // replay converges: deterministic retrain over the same committed
    // corpus, idempotent lands, swap completes
    val swapped = StreamVectorIndex.retrainIfDrifted(spark, root, 10.0,
      seedStride = 25, eps = 1e-3)
    assert(swapped.contains(1L) && StreamVectorIndex.currentGen(root).contains(1L))
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == totalRows,
      "the new generation must hold every committed row")
    assert(StreamVectorIndex.driftScore(root) == 0.0,
      "the new generation's baseline is its own build — drift resets")

    // quality: recall on the new index >= recall on the stale one
    // (measured by the existing recall machinery over the same probes
    // and the same brute-force truth), and the balance pathology that
    // MOTIVATES the retrain is actually fixed — the stale quantizer
    // crams the drifted cluster into a few giant lists
    val all = StreamVectorIndex.readCurrentIndex(spark, root)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val probes = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pemb"))
    val topk = udaf(new graft.functions.TopKAgg(5))
    val brute = probes.join(all)
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("id"),
        call_function("cosine_sim", col("pemb"), col("embedding")).as("sim"))
      .groupBy(col("probe_id")).agg(topk(col("sim"), col("id")).as("nn"))
      .select(col("probe_id"), explode(col("nn")).as("n"))
      .select(col("probe_id"), col("n.id").as("neighbor_id"))
      .localCheckpoint()
    def meanRecall(gen: Long): Double = {
      val dir = StreamVectorIndex.genDir(root, gen)
      val cents = spark.read.parquet(s"$dir/_centroids")
      val approx = VectorQueries.probeListsFrom(
        probes, cents, StreamVectorIndex.readIndex(spark, dir), 5)
      VectorQueries.recallOf(brute, approx)
        .agg(avg(col("recall_e6"))).collect().head.getDouble(0)
    }
    val staleRecall = meanRecall(0L)
    val newRecall = meanRecall(1L)
    assert(newRecall >= staleRecall,
      s"retrain degraded recall: stale $staleRecall vs new $newRecall")
    def maxListFraction(gen: Long): Double = {
      val m = StreamVectorIndex.manifest(StreamVectorIndex.genDir(root, gen))
      m.values.max.toDouble / m.values.sum
    }
    assert(maxListFraction(1L) < maxListFraction(0L),
      s"retrain must fix the list imbalance: stale ${maxListFraction(0L)} vs new ${maxListFraction(1L)}")
  }

  test("the generation lifecycle LOOPS: post-swap commits land in the new generation, a second drift cycle retrains again, gc trims history") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val root = tmpDir()
    StreamVectorIndex.initIndex(vecs, VectorQueries.sampledCentroids(vecs), root)

    // cycle 1: negated arrivals drift gen 0 → retrain → gen 1 serves
    val negated = vecs.select((col("vec_id") + 200000L).as("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    assert(StreamVectorIndex.commitBatchCurrent(negated, spark, root, epochId = 1L))
    val d1 = StreamVectorIndex.driftScore(root)
    info(f"cycle-1 drift $d1%.2f")
    assert(d1 > 5.0, s"cycle-1 drift must exceed the threshold: $d1")
    assert(StreamVectorIndex.retrainIfDrifted(spark, root, 5.0,
      seedStride = 25, eps = 1e-3).contains(1L))
    val gen1Rows = StreamVectorIndex.readCurrentIndex(spark, root).count()
    assert(gen1Rows == 2 * vecs.count(), "gen 1 must hold the full committed corpus")

    // post-swap arrivals land in the NEW generation, assigned with ITS
    // quantizer — the serving loop continues across the swap
    val copies = vecs.select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
    assert(StreamVectorIndex.commitBatchCurrent(copies, spark, root, epochId = 2L))
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == gen1Rows + vecs.count(),
      "post-swap arrivals must land in the serving generation")
    // ...and gen 0 did NOT grow (the old generation is retired, not fed)
    assert(StreamVectorIndex.readIndex(spark,
      StreamVectorIndex.genDir(root, 0L)).count() == 2 * vecs.count())

    // cycle 2: a THIRD distribution (dimension-reversed) drifts gen 1 —
    // the loop is a loop, not a one-shot: retrain fires again, gen 2
    // serves, and gc now retires gen 0 (outside serving + 1 history)
    val reversed = vecs.select((col("vec_id") + 400000L).as("vec_id"),
      reverse(col("embedding")).as("embedding"))
    assert(StreamVectorIndex.commitBatchCurrent(reversed, spark, root, epochId = 3L))
    val d2 = StreamVectorIndex.driftScore(root)
    info(f"cycle-2 drift $d2%.2f")
    assert(d2 > 5.0, s"second-cycle drift must register: $d2")
    assert(StreamVectorIndex.retrainIfDrifted(spark, root, 5.0,
      seedStride = 25, eps = 1e-3).contains(2L))
    assert(StreamVectorIndex.currentGen(root).contains(2L))
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == 4 * vecs.count())
    assert(StreamVectorIndex.gcGenerations(root, keep = 1) == Seq(0L))
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == 4 * vecs.count(),
      "gc must not touch the serving generation's rows")
  }

  test("generation gc keeps serving + history, never a landed-but-unswapped successor") {
    val vecs = corpus().select(col("vec_id"), col("embedding")).limit(100).localCheckpoint()
    val cents = VectorQueries.sampledCentroids(vecs).cache()
    val root = tmpDir()
    // four landed generations; serving pointer at 2 — gen 3 is a
    // crashed retrain's land awaiting its replayed swap
    (0L to 3L).foreach(g => StreamVectorIndex.buildGeneration(vecs, cents, root, g))
    StreamVectorIndex.writeGenPointer(root, 2L)
    val deleted = StreamVectorIndex.gcGenerations(root, keep = 1)
    assert(deleted == Seq(0L), s"only gen 0 is out of the retention window: $deleted")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(StreamVectorIndex.genDir(root, 0L))))
    // serving, its predecessor, and the unswapped successor all survive
    Seq(1L, 2L, 3L).foreach { g =>
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(StreamVectorIndex.genDir(root, g))), s"gen $g must survive")
    }
    // serving still reads after the sweep; idempotent rerun deletes nothing
    assert(StreamVectorIndex.readCurrentIndex(spark, root).count() == 100)
    assert(StreamVectorIndex.gcGenerations(root, keep = 1).isEmpty)
  }
}
