package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvAgg
import graft.queries.SketchQueries

/** KmvAgg aggregator semantics (bounded, distinct, merge-associative)
  * and the sketch queries' accuracy against exact answers — the oracle
  * proves both engines compute the same ESTIMATE; this spec proves the
  * estimate is close to the TRUTH. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "sketch-spec")

  private val sfDir = "/root/testdata/sf0.01"

  // --- KmvAgg unit behavior --------------------------------------------

  test("KmvAgg keeps the k smallest distinct values, sorted") {
    val agg = new KmvAgg(4)
    val buf = Seq(9L, 5L, 7L, 9L, 1L, 5L, 3L, 8L, 1L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(1L, 3L, 5L, 7L))
  }

  test("KmvAgg merge is a bounded sorted-distinct merge") {
    val agg = new KmvAgg(4)
    val a = Seq(1L, 4L, 6L, 9L)
    val b = Seq(2L, 4L, 5L, 9L)
    assert(agg.merge(a, b) == Seq(1L, 2L, 4L, 5L))
    assert(agg.merge(agg.zero, a) == a)
    assert(agg.merge(a, agg.zero) == a)
    // associativity on a concrete triple
    val c = Seq(0L, 3L)
    assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
  }

  test("KmvAgg reduce ignores values above a full buffer's max") {
    val agg = new KmvAgg(3)
    val full = Seq(1L, 2L, 3L)
    assert(agg.reduce(full, 10L) eq full)
    assert(agg.reduce(full, 2L) eq full) // duplicate of a kept value
  }

  test("property: merging per-group sketches ≡ sketching all rows (re-aggregation)") {
    // the rollup contract behind sketch_distinct_rollup: per-scope
    // sketches merged with KmvMergeAgg must equal the sketch built
    // from every row — for any grouping and any k
    import graft.functions.KmvMergeAgg
    val rnd = new scala.util.Random(7)
    for (k <- Seq(3, 8, 64); trial <- 1 to 5) {
      val values = Seq.fill(200)(rnd.nextLong(1000000).abs)
      val nGroups = 1 + rnd.nextInt(7)
      val build = new KmvAgg(k)
      val merge = new KmvMergeAgg(k)
      val perGroup = values.groupBy(v => (v % nGroups).toInt).values
        .map(_.foldLeft(build.zero)(build.reduce))
      val rolled = perGroup.foldLeft(merge.zero)(merge.reduce)
      val whole = values.foldLeft(build.zero)(build.reduce)
      assert(rolled == whole,
        s"k=$k trial=$trial groups=$nGroups: rollup $rolled != whole $whole")
    }
  }

  test("property: KmvAgg ≡ brute-force k-smallest-distinct under any split") {
    val rnd = new scala.util.Random(42)
    val agg = new KmvAgg(8)
    (1 to 200).foreach { _ =>
      // heavy duplication on purpose: values from a small domain
      val xs = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong)
      val expected = xs.distinct.sorted.take(8)
      // reduce-all
      assert(xs.foldLeft(agg.zero)(agg.reduce) == expected)
      // arbitrary split, partial reduce, then merge — the distributed path
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected, s"split path diverged on $xs")
    }
  }

  test("SQL surface kmv_sketch/kmv_estimate matches the DataFrame path") {
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("ev_kmv")
    val sql = spark.sql(
      """SELECT event_type,
        |  kmv_estimate(kmv_sketch(
        |    CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |  ), 64) AS est_distinct
        |FROM ev_kmv GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df = SketchQueries.sketchDistinctKmv(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sql == df, s"SQL $sql vs DataFrame $df")
  }

  test("kmv_estimate rejects a capacity mismatch loudly") {
    // a full k=64 sketch passed with a smaller k must throw, not return
    // a silently-wrong estimate (the sketch length exceeds the claimed
    // capacity — proof the caller's k is not the build-time k)
    Tables.load(spark, sfDir, "events").createOrReplaceTempView("ev_kmv_bad")
    val err = intercept[Exception] {
      spark.sql(
        """SELECT kmv_estimate(kmv_sketch(
          |  CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
          |), 32) FROM ev_kmv_bad""".stripMargin).collect()
    }
    assert(err.getMessage != null)
  }

  // --- estimate-vs-truth accuracy --------------------------------------

  test("KMV distinct estimate is within 30% of the exact count") {
    val est = SketchQueries.sketchDistinctKmv(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, nd) =>
      // k=64 → σ ≈ 1/sqrt(k-2) ≈ 12.7%; 30% is > 2σ
      assert(math.abs(est(t) - nd) <= 0.30 * nd,
        s"type $t: est ${est(t)} vs exact $nd")
      // estimator path must actually engage at this scale
      assert(nd > 64, s"type $t has only $nd distinct users — exact path")
    }
  }

  test("CMS estimates dominate true counts and stay within the width bound") {
    val rows = SketchQueries.sketchHeavyHitters(spark, sfDir).collect()
    assert(rows.length == 20)
    val n = Tables.load(spark, sfDir, "events").count()
    rows.foreach { r =>
      val (est, truth) = (r.getLong(1), r.getLong(2))
      assert(est >= truth, s"user ${r.getLong(0)}: est $est < true $truth")
      // expected overestimate per row is N/w; min over 4 rows stays
      // well under a few multiples of it on non-adversarial data
      assert(est - truth <= 8 * n / 256,
        s"user ${r.getLong(0)}: est $est vs true $truth (n=$n)")
    }
  }

  test("CMS rolls up by counter addition: per-group sketches summed ≡ direct build") {
    // the CMS re-aggregation story needs no custom aggregator — counter
    // cells add. Per-event_type sketches summed cell-wise must equal the
    // sketch built over all rows in one pass, bit for bit.
    import graft.functions.Cms
    val ev = Tables.load(spark, sfDir, "events")
    def cells(grouped: Boolean) = {
      val base = ev.select(
        (if (grouped) Seq(col("event_type")) else Seq.empty) ++
          Seq(Cms.rows(col("user_id")).as("j"), col("user_id")): _*)
        .select((if (grouped) Seq(col("event_type")) else Seq.empty) ++
          Seq(col("j"), Cms.bucket(col("j"), col("user_id")).as("b")): _*)
      if (grouped)
        base.groupBy(col("event_type"), col("j"), col("b")).agg(count(lit(1)).as("c"))
          .groupBy(col("j"), col("b")).agg(sum(col("c")).as("c")) // the rollup: cell add
      else base.groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
    }
    val rolled = cells(grouped = true).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = cells(grouped = false).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rolled == direct, "summed per-group CMS cells diverge from the direct build")
  }

  test("quantile samples roll up by array concat: merged per-group samples ≡ direct global sample") {
    // the per-row hash predicate makes union(per-group samples) exactly
    // the global sample, so the rolled-up quantiles must equal the
    // direct global sampled quantiles bit for bit — the third sketch
    // family's rollup law (KMV merges arrays, CMS adds counters).
    val rolled = SketchQueries.sketchQuantileRollup(spark, sfDir).head()
    val hv = conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10).cast("long")
    val direct = Tables.load(spark, sfDir, "events")
      .filter(pmod(hv, lit(20L)) === 0)
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(lit(1)).as("n"))
      .head()
    assert(rolled.getDouble(0) == direct.getDouble(0), "p50 diverges")
    assert(rolled.getDouble(1) == direct.getDouble(1), "p95 diverges")
    assert(rolled.getLong(2) == direct.getLong(2), "sample size diverges")
  }

  test("hash-sampled quantiles track exact quantiles") {
    val sampled = SketchQueries.sketchSampleQuantile(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(4))).toMap
    val exact = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(sampled.keySet == exact.keySet)
    exact.foreach { case (t, (p50, p95, n)) =>
      val (s50, s95, estTotal) = sampled(t)
      val spread = p95 - p50
      assert(math.abs(s50 - p50) <= 0.25 * spread, s"$t p50: $s50 vs $p50")
      assert(math.abs(s95 - p95) <= 0.25 * spread, s"$t p95: $s95 vs $p95")
      // 1-in-20 Bernoulli-by-hash sample: est_total within 30% of n
      assert(math.abs(estTotal.toDouble - n) <= 0.30 * n, s"$t total: $estTotal vs $n")
    }
  }

  test("KMV intersection estimate tracks true day-over-day returning users") {
    val rows = SketchQueries.sketchDistinctIntersect(spark, sfDir).collect()
    assert(rows.length > 5, s"only ${rows.length} adjacent-day pairs")
    rows.foreach { r =>
      val est = r.getAs[Double]("est_returning")
      val truth = r.getAs[Long]("true_returning").toDouble
      // k=64 union sketch + binomial rho: comfortably within 35% here
      assert(math.abs(est - truth) <= 0.35 * truth,
        s"day ${r.getAs[Long]("day")}: est $est vs true $truth")
    }
    // aggregate error should be far tighter than the per-day bound
    val mre = rows.map { r =>
      math.abs(r.getAs[Double]("est_returning") - r.getAs[Long]("true_returning")) /
        r.getAs[Long]("true_returning").toDouble
    }.sum / rows.length
    assert(mre <= 0.15, s"mean relative error $mre")
  }
}
