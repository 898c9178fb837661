package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Cms, Kmv, KmvAgg}

/** Deterministic sketch operators — the bounded-state estimators a
  * 100 TB pipeline reaches for when exact answers cost a full shuffle of
  * the value space:
  *
  *  - KMV distinct sketch: k smallest md5-hash values per group →
  *    (k-1)/h_k estimator. State ≤ k longs/group, partial-merge
  *    aggregation; the exchange never carries the distinct set.
  *  - Count-Min frequency sketch: d×w counters built in ONE hash-agg
  *    over the stream (map-side combinable, so the exchange carries
  *    ≤ partitions × d × w rows whatever the input size); point
  *    estimates are min-over-rows, guaranteed ≥ the true count.
  *  - Hash-sampled quantiles: exact percentile over a deterministic
  *    1/m uniform sample keyed on row identity — the scan reads 100 TB
  *    but the sort-based quantile state is 1/m of it, and the sample is
  *    replay-stable (no rand()) so reruns and engines agree bit-for-bit.
  *
  * Why not `approx_count_distinct`/`approx_percentile`: those are the
  * right built-ins in production, but HLL and t-digest internals differ
  * per engine so no cross-engine oracle can check them. These sketches
  * are built from md5 — DuckDB computes the IDENTICAL estimate, making
  * approximation itself hash-checkable (error bounds are asserted
  * separately in SketchSpec against exact answers).
  *
  * Cross-engine parity notes: hashes are md5 hex prefixes (identical in
  * both engines); 60-bit prefixes normalize to (0,1) via one long→double
  * cast + divide (IEEE-identical rounding both sides); estimates round
  * to 6 decimals like the percentile queries.
  */
object SketchQueries {

  // --- KMV distinct-count sketch ---------------------------------------
  private val KmvK = 64

  /** Estimated distinct users per event_type through a k=64 KMV sketch.
    * Groups with fewer than k distinct hashes report the exact count
    * (the sketch IS the distinct set below its capacity). */
  def sketchDistinctKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val kmv = udaf(new KmvAgg(KmvK))
    ev.filter(col("user_id").isNotNull) // null-key drop = COUNT(DISTINCT) semantics
      .select(col("event_type"), Kmv.keyHash(col("user_id")).as("hv"))
      .groupBy(col("event_type"))
      .agg(kmv(col("hv")).as("ks"))
      .select(col("event_type"),
        Kmv.estimate(col("ks"), KmvK).as("est_distinct"))
      .orderBy(col("event_type"))
  }

  /** DuckDB mirror: the k-th smallest distinct hash via row_number —
    * correct at oracle scale; the engine's bounded aggregator is the
    * scale path (a window would shuffle the whole distinct set). */
  val sketchDistinctKmvSql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT event_type,
      |    CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (
      |  SELECT event_type, hv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS nd
      |  FROM h)
      |SELECT event_type,
      |  round(CASE WHEN nd < $KmvK THEN CAST(nd AS DOUBLE)
      |    ELSE ${KmvK - 1}.0 / (CAST(hv AS DOUBLE) / ${Kmv.Hash60}) END, 6) AS est_distinct
      |FROM r WHERE rn = least(nd, $KmvK)
      |ORDER BY event_type""".stripMargin

  // --- Count-Min heavy-hitter estimates --------------------------------
  private val CmsDepth = Cms.DefaultDepth
  private val CmsWidth = Cms.DefaultWidth
  private val CmsProbes = 20

  private def cmsBucket(j: Column, u: Column): Column = Cms.bucket(j, u)

  /** Event counts for a probe set of users estimated from a 4×256
    * Count-Min sketch, with the true counts alongside (est ≥ true by
    * construction; the probe-side true count is a broadcast-semi-join
    * agg, cheap at any scale). */
  def sketchHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val sketch = ev
      .select(explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"), col("user_id"))
      .select(col("j"), cmsBucket(col("j"), col("user_id")).as("b"))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
    val probes = spark.range(0, CmsProbes).select(col("id").as("user_id"))
    // the sketch is ≤ d×w rows by construction — always broadcastable
    val est = Cms.estimate(sketch, probes, "user_id")
    val truth = ev.join(broadcast(probes), Seq("user_id"), "left_semi")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    est.join(truth, Seq("user_id"), "left")
      .select(col("user_id"), col("est_count"),
        coalesce(col("cnt"), lit(0L)).as("true_count"))
      .orderBy(col("user_id"))
  }

  val sketchHeavyHittersSql: String =
    s"""WITH g AS (SELECT unnest(range(0, $CmsDepth)) AS j),
      |sketch AS (
      |  SELECT j,
      |    CAST(('0x'||substr(md5(CAST(j AS VARCHAR)||':'||CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) % $CmsWidth AS b,
      |    count(*) AS c
      |  FROM events CROSS JOIN g GROUP BY 1, 2),
      |probes AS (SELECT unnest(range(0, $CmsProbes)) AS user_id),
      |pb AS (
      |  SELECT user_id, j,
      |    CAST(('0x'||substr(md5(CAST(j AS VARCHAR)||':'||CAST(user_id AS VARCHAR)),1,8)) AS BIGINT) % $CmsWidth AS b
      |  FROM probes CROSS JOIN g),
      |est AS (
      |  SELECT user_id, min(coalesce(c, 0)) AS est_count
      |  FROM pb LEFT JOIN sketch USING (j, b) GROUP BY 1),
      |tc AS (
      |  SELECT p.user_id, count(e.user_id) AS true_count
      |  FROM probes p LEFT JOIN events e ON p.user_id = e.user_id GROUP BY 1)
      |SELECT est.user_id, est_count, true_count
      |FROM est JOIN tc ON est.user_id = tc.user_id
      |ORDER BY est.user_id""".stripMargin

  // --- hash-sampled exact quantiles ------------------------------------
  private val SampleMod = 20L

  /** Per-type p50/p95 over a deterministic 1-in-20 sample keyed on
    * event_id's md5 — the global-quantile-at-scale pattern: the exact
    * (sort-based) percentile state is 5% of the input, and the sample
    * is identical on every engine and every rerun. */
  def sketchSampleQuantile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val hv = conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    ev.filter(pmod(hv, lit(SampleMod)) === 0)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_sample"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_sample"),
        count(lit(1)).as("n_sample"),
        (count(lit(1)) * lit(SampleMod)).as("est_total"))
      .orderBy(col("event_type"))
  }

  val sketchSampleQuantileSql: String =
    s"""SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50_sample,
      |  round(quantile_cont(value, 0.95), 6) AS p95_sample,
      |  count(*) AS n_sample,
      |  CAST(count(*) * $SampleMod AS BIGINT) AS est_total
      |FROM events
      |WHERE CAST(('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,8)) AS BIGINT) % $SampleMod = 0
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- quantile-sketch rollup: per-group samples → global quantiles -----
  // Completes the rollup story for the THIRD sketch family: the
  // deterministic hash sample is a per-row predicate, so the union of
  // per-group samples IS the global sample — per-scope sample arrays
  // persist once and any coarser scope's exact quantiles come from
  // merging arrays, never rescanning rows (KMV merges k-long arrays,
  // CMS adds counters, quantile samples concatenate). The oracle
  // computes the global sampled quantiles DIRECTLY from the raw rows,
  // so the hash match certifies rollup(per-group) ≡ direct(all rows).
  // Scale: per-group state is that group's 1-in-20 sample (the sketch
  // contract); the rollup stage touches only the arrays.
  def sketchQuantileRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val hv = conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    // stage 1 — what production persists: one sorted sample array per type
    val perType = ev.filter(pmod(hv, lit(SampleMod)) === 0)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("sample"))
    // stage 2 — global quantiles from the persisted arrays alone
    perType.select(explode(col("sample")).as("value"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_sample"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_sample"),
        count(lit(1)).as("n_sample"),
        (count(lit(1)) * lit(SampleMod)).as("est_total"))
  }

  val sketchQuantileRollupSql: String =
    s"""SELECT
      |  round(quantile_cont(value, 0.5), 6) AS p50_sample,
      |  round(quantile_cont(value, 0.95), 6) AS p95_sample,
      |  count(*) AS n_sample,
      |  CAST(count(*) * $SampleMod AS BIGINT) AS est_total
      |FROM events
      |WHERE CAST(('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,8)) AS BIGINT) % $SampleMod = 0""".stripMargin

  // --- sketch re-aggregation: per-group sketches → global rollup --------
  // The OTHER half of the sketch contract, and the reason sketches win
  // at 100 TB: per-scope sketches (per hour, per source, per partition)
  // are persisted ONCE, and every coarser scope rolls up by merging the
  // k-long sketch arrays — no rescan of the rows. Sound because the k
  // smallest distinct hashes of a union are contained in the union of
  // each side's k smallest. The oracle computes the global estimate
  // straight from the rows, so the driver hash-check proves
  // merge(per-group sketches) ≡ sketch(all rows) end to end.
  def sketchDistinctRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.KmvMergeAgg
    val ev = Tables.load(spark, sfDir, "events")
    val kmv = udaf(new KmvAgg(KmvK))
    val kmvMerge = udaf(new KmvMergeAgg(KmvK))
    val perType = ev.filter(col("user_id").isNotNull)
      .select(col("event_type"), Kmv.keyHash(col("user_id")).as("hv"))
      .groupBy(col("event_type"))
      .agg(kmv(col("hv")).as("ks"))
    perType
      .agg(kmvMerge(col("ks")).as("gks"))
      .select(lit("all_events").as("scope"),
        Kmv.estimate(col("gks"), KmvK).as("est_distinct"))
  }

  /** Oracle: the global estimator over the raw rows — NOT over merged
    * per-group sketches — so a hash match certifies re-aggregation
    * loses nothing vs a full rescan. */
  val sketchDistinctRollupSql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT
      |    CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (
      |  SELECT hv, row_number() OVER (ORDER BY hv) AS rn, count(*) OVER () AS nd
      |  FROM h)
      |SELECT 'all_events' AS scope,
      |  round(CASE WHEN nd < $KmvK THEN CAST(nd AS DOUBLE)
      |    ELSE ${KmvK - 1}.0 / (CAST(hv AS DOUBLE) / ${Kmv.Hash60}) END, 6) AS est_distinct
      |FROM r WHERE rn = least(nd, $KmvK)""".stripMargin
}
