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

  // --- KMV set-operation algebra: intersection from per-scope sketches --
  // The audience-overlap question ("how many of day d's users returned
  // on day d+1") answered from the SAME persisted per-day KMV sketches
  // the distinct counts use — never a re-scan, never an exact
  // user_id⨝user_id shuffle across days. Standard KMV intersection
  // estimator: merge the two sketches into the union sketch (k smallest
  // distinct hashes of A∪B), let ρ = the fraction of those that appear
  // in BOTH input sketches, and est(∩) = ρ · est(∪). Below capacity the
  // union sketch IS the full distinct hash set and the estimate is
  // exact. All array ops are builtins over ≤k-long sorted arrays; the
  // pair frame is one row per adjacent day. `true_intersect` rides
  // along as the eval column (same pattern as sketch_heavy_hitters'
  // true_count): its exact distinct-pair join is what production SKIPS
  // at 100 TB — the retention curve comes from sketches alone.
  private val DayNs = 86400L * 1000000000L

  def sketchDistinctIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val kmv = udaf(new KmvAgg(KmvK))
    val perDay = ev.filter(col("user_id").isNotNull)
      .select(expr(s"ts div ${DayNs}L").as("day"),
        Kmv.keyHash(col("user_id")).as("hv"))
      .groupBy(col("day"))
      .agg(kmv(col("hv")).as("ks"))
      .cache() // both join sides read it — uncached, the KMV scan runs twice
    val pairs = perDay.select(col("day"), col("ks").as("ka"))
      .join(broadcast(perDay.select((col("day") - 1).as("day"), col("ks").as("kb"))),
        Seq("day"))
    val u = slice(array_sort(array_union(col("ka"), col("kb"))), 1, KmvK)
    val est = pairs
      .select(col("day"), col("ka"), col("kb"), u.as("un"))
      .select(col("day"),
        size(col("un")).as("kk"),
        size(array_intersect(col("un"), array_intersect(col("ka"), col("kb")))).as("ib"),
        when(size(col("un")) < KmvK, size(col("un")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) /
            (element_at(col("un"), KmvK).cast("double") / lit(Kmv.Hash60))).as("est_u"))
      .select(col("day"),
        round(col("est_u"), 6).as("est_union"),
        round(col("ib").cast("double") / col("kk").cast("double") * col("est_u"), 6)
          .as("est_returning"))
    val ud = ev.filter(col("user_id").isNotNull)
      .select(expr(s"ts div ${DayNs}L").as("day"), col("user_id")).distinct()
      .cache() // eval column only: both sides of the truth semi join
    val truth = ud
      .join(ud.select((col("day") - 1).as("day"), col("user_id")), Seq("day", "user_id"),
        "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("true_returning"))
    est.join(truth, Seq("day"), "left")
      .select(col("day"), col("est_union"), col("est_returning"),
        coalesce(col("true_returning"), lit(0L)).as("true_returning"))
      .orderBy(col("day"))
  }

  val sketchDistinctIntersectSql: String =
    s"""WITH h AS (
      |  SELECT DISTINCT epoch_ns(ts) // $DayNs AS day,
      |    CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15)) AS BIGINT) AS hv
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (
      |  SELECT day, hv, row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
      |  FROM h),
      |sk AS (
      |  SELECT day, list(hv ORDER BY hv) AS ks
      |  FROM r WHERE rn <= $KmvK GROUP BY 1),
      |pairs AS (
      |  SELECT a.day, a.ks AS ka, b.ks AS kb
      |  FROM sk a JOIN sk b ON b.day = a.day + 1),
      |wu AS (
      |  SELECT day, ka, kb,
      |    list_sort(list_distinct(list_concat(ka, kb)))[1:$KmvK] AS un
      |  FROM pairs),
      |calc AS (
      |  SELECT day, len(un) AS kk,
      |    len(list_intersect(un, list_intersect(ka, kb))) AS ib,
      |    CASE WHEN len(un) < $KmvK THEN CAST(len(un) AS DOUBLE)
      |      ELSE ${KmvK - 1}.0 / (CAST(un[$KmvK] AS DOUBLE) / ${Kmv.Hash60}) END AS est_u
      |  FROM wu),
      |ud AS (
      |  SELECT DISTINCT epoch_ns(ts) // $DayNs AS day, user_id
      |  FROM events WHERE user_id IS NOT NULL),
      |ti AS (
      |  SELECT a.day, count(*) AS true_returning
      |  FROM ud a WHERE EXISTS (
      |    SELECT 1 FROM ud b WHERE b.user_id = a.user_id AND b.day = a.day + 1)
      |  GROUP BY 1)
      |SELECT c.day, round(est_u, 6) AS est_union,
      |  round(CAST(ib AS DOUBLE) / CAST(kk AS DOUBLE) * est_u, 6) AS est_returning,
      |  coalesce(ti.true_returning, 0) AS true_returning
      |FROM calc c LEFT JOIN ti ON c.day = ti.day
      |ORDER BY c.day""".stripMargin

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
