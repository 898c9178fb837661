package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/** Multi-iteration k-means training: the Lloyd objective (mean best
  * cosine similarity over the corpus) must not degrade per iteration,
  * and centroids stay bounded. */
class KMeansSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "kmeans-spec")

  private def objective(vecs: DataFrame, cents: DataFrame): Double = {
    vecs.join(broadcast(cents))
      .select(col("vec_id"),
        call_function("cosine_sim", col("embedding"), col("cemb")).as("csim"))
      .groupBy(col("vec_id")).agg(max(col("csim")).as("best"))
      .agg(avg(col("best"))).head.getDouble(0)
  }

  test("Lloyd iterations do not degrade the clustering objective") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val seeds = VectorQueries.trainCentroids(vecs, seedStride = 10, iters = 0)
    val after1 = VectorQueries.trainCentroids(vecs, seedStride = 10, iters = 1)
    val after3 = VectorQueries.trainCentroids(vecs, seedStride = 10, iters = 3)
    val o0 = objective(vecs, seeds)
    val o1 = objective(vecs, after1)
    val o3 = objective(vecs, after3)
    // k-means monotonicity holds for squared-distance; for cosine on
    // mean-recentered centroids it holds in practice on this data — the
    // guard allows only ulp-scale slack
    assert(o1 >= o0 - 1e-9, s"iteration 1 degraded: $o0 -> $o1")
    assert(o3 >= o1 - 1e-9, s"iterations 2-3 degraded: $o1 -> $o3")
    assert(o3 > o0, s"training never improved: $o0 -> $o3")
    val k0 = seeds.count()
    assert(after3.count() <= k0 && after3.count() > 0)
  }

  /** Mean squared L2 distance to the nearest centroid — the standard
    * quantization-error telemetry a production trainer logs per iter. */
  private def quantError(vecs: DataFrame, cents: DataFrame): Double =
    vecs.join(broadcast(cents))
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), col("cemb"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, v) => a + v).as("d2"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("best"))
      .agg(avg(col("best"))).head.getDouble(0)

  test("quantization error is monotonically non-increasing across iterations") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val errs = (0 to 3).map(i =>
      quantError(vecs, VectorQueries.trainCentroids(vecs, seedStride = 10, iters = i)))
    errs.sliding(2).zipWithIndex.foreach { case (Seq(prev, next), i) =>
      assert(next <= prev + 1e-9,
        s"iteration ${i + 1} RAISED quantization error: $prev -> $next (all: $errs)")
    }
    assert(errs.last < errs.head,
      s"training never reduced quantization error: $errs")
  }

  test("epsilon-terminated training converges and matches fixed-round quality") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (cents, rounds) = VectorQueries.kmeansConverged(
      vecs, seedStride = 10, eps = 1e-3, maxIters = 40)
    assert(rounds >= 1 && rounds <= 40)
    // the converged quantizer is at least as good as one fixed Lloyd step
    val e1 = quantError(vecs, VectorQueries.trainCentroids(vecs, seedStride = 10, iters = 1))
    val eC = quantError(vecs, cents)
    assert(eC <= e1 + 1e-9, s"converged error $eC worse than one-step $e1")
    assert(cents.count() > 0)
  }

  test("an unreachable epsilon within the round budget fails loudly") {
    val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val ex = intercept[IllegalArgumentException] {
      VectorQueries.kmeansConverged(vecs, seedStride = 10, eps = 0.0, maxIters = 1)
    }
    assert(ex.getMessage.contains("failed to converge"))
  }

  test("a centroid whose cluster empties is carried forward, never silently dropped") {
    import spark.implicits._
    // seed 20 duplicates seed 0's position exactly: every point in that
    // cluster (including 20 itself) TIES between centroids 0 and 20 and
    // the deterministic tie-break sends them all to 0 — centroid 20
    // empties in round 1. Convergence must still return ALL seed ids —
    // a dropped id would mean the loop "converged" by losing a cell
    val v = Seq(1f, 0f, 0.5f)
    val pts = ((0 until 10).map(i => (i.toLong, v)) ++
      (10 until 20).map(i => (i.toLong, Seq(0f, 1f, 0.25f))) ++
      Seq((20L, v)))
      .toDF("vec_id", "embedding")
    graft.functions.VectorFunctions.register(spark)
    val (cents, rounds) = VectorQueries.kmeansConverged(
      pts, seedStride = 10, eps = 1e-6, maxIters = 30)
    val ids = cents.select("cent_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 10L, 20L),
      s"quantizer lost cells: $ids — emptied centroids must be carried forward")
    // round 1 charges the emptying as movement 1.0, so at least 2 rounds ran
    assert(rounds >= 2, s"emptying must force a second round (got $rounds)")
  }
}
