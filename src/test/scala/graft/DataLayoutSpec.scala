package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.{BloomIndex, DataLayout, DataLayoutN}

/** Z-order layout + stats pruning: the pruned rectangle read must equal
  * the plain filtered scan (no row lost to pruning, none invented), the
  * pruning must actually SKIP buckets — including for a query selective
  * only on the SECOND dimension, the case a single-column sort layout
  * cannot prune at all — and the skip must be partition pruning in the
  * physical plan, not a post-scan filter. */
class DataLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "layout-spec")

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val layoutDir: String = {
    val dir = Files.createTempDirectory("layout-spec").toString
    DataLayout.writeZOrdered(
      Tables.load(spark, sfDir, "events"), dir, "ts", "user_id", bucketBits = 6)
    dir
  }

  // one-week × 30-user rectangle (sf0.01 spans Jan 2024, users 0..149)
  private val TsLo = 1704672000000000000L
  private val TsHi = 1705276799999999999L

  test("pruned rectangle read equals the plain filtered scan") {
    val pruned = DataLayout
      .readPruned(spark, layoutDir, "ts", TsLo, TsHi, "user_id", 30, 59)
      .select("event_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    val plain = Tables.load(spark, sfDir, "events")
      .filter(col("ts").between(TsLo, TsHi) && col("user_id").between(30, 59))
      .select("event_id").as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(plain.nonEmpty, "fixture rectangle must be non-empty")
    assert(pruned.toSeq == plain.toSeq)
  }

  test("rectangle selective on both dimensions skips most buckets") {
    val stats = DataLayout.readStats(spark, layoutDir)
    assert(stats.size > 32, s"expected a mostly-populated bucket space, got ${stats.size}")
    val chosen = DataLayout.prunedBuckets(stats, TsLo, TsHi, 30, 59)
    assert(chosen.nonEmpty)
    // 1/4 of the month × 1/5 of the users: the 8×8 z-grid should keep
    // roughly (2 ts slices)×(2-3 user slices) — well under a third.
    assert(chosen.size * 3 <= stats.size,
      s"rectangle kept ${chosen.size} of ${stats.size} buckets — pruning ineffective")
  }

  test("query selective only on the SECOND dimension still prunes") {
    val stats = DataLayout.readStats(spark, layoutDir)
    // full time range, bottom ~1/8 of users: a ts-sorted layout keeps
    // every file here; the z-layout keeps only the low user-slices.
    val chosen = DataLayout.prunedBuckets(stats, Long.MinValue, Long.MaxValue, 0, 17)
    assert(chosen.nonEmpty)
    assert(chosen.size * 2 <= stats.size,
      s"second-dimension query kept ${chosen.size} of ${stats.size} buckets")
  }

  test("bucket skip is partition pruning in the physical plan") {
    val df = DataLayout.readPruned(spark, layoutDir, "ts", TsLo, TsHi, "user_id", 30, 59)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(DataLayout.ZBucketCol),
      s"expected ${DataLayout.ZBucketCol} partition filters in:\n$plan")
  }

  test("random rectangles: pruned read equals plain filter for every query") {
    val rnd = new scala.util.Random(20260814)
    val dir = Files.createTempDirectory("layout-prop").toString
    val df = spark.range(5000).selectExpr(
      "CAST(hash(id) % 100000 AS LONG) AS a",
      "CAST(hash(id + 7) % 1000 AS LONG) AS b")
    DataLayout.writeZOrdered(df, dir, "a", "b", bucketBits = 4)
    val cached = df.cache(); cached.count()
    (1 to 12).foreach { _ =>
      val (a1, a2) = {
        val x = rnd.nextLong() % 100000; val y = rnd.nextLong() % 100000
        (math.min(x, y), math.max(x, y))
      }
      val (b1, b2) = {
        val x = rnd.nextLong() % 1000; val y = rnd.nextLong() % 1000
        (math.min(x, y), math.max(x, y))
      }
      val pruned = DataLayout.readPruned(spark, dir, "a", a1, a2, "b", b1, b2)
        .selectExpr("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val plain = cached
        .filter(col("a").between(a1, a2) && col("b").between(b1, b2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(pruned == plain, s"rectangle [$a1,$a2]x[$b1,$b2] diverges")
    }
    cached.unpersist()
  }

  test("append maintains the layout: saved curve, widened stats, exact pruned reads") {
    val dir = Files.createTempDirectory("layout-append").toString
    val base = spark.range(2000).selectExpr("id AS a", "CAST(id % 500 AS LONG) AS b")
    DataLayout.writeZOrdered(base, dir, "a", "b", bucketBits = 4)
    // increment: half in-range re-keys, half OUTSIDE the original ranges
    val inc = spark.range(400).selectExpr(
      "CASE WHEN id < 200 THEN id * 7 ELSE 5000 + id END AS a",
      "CASE WHEN id < 200 THEN CAST(id % 500 AS LONG) ELSE 900 + id END AS b")
    DataLayout.append(inc, dir)
    val everything = base.unionByName(inc)
    // rectangles inside, straddling, and fully beyond the original range
    Seq((100L, 900L, 50L, 400L), (1500L, 6000L, 100L, 1400L), (5000L, 6000L, 900L, 1400L))
      .foreach { case (a1, a2, b1, b2) =>
        val pruned = DataLayout.readPruned(spark, dir, "a", a1, a2, "b", b1, b2)
          .selectExpr("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val plain = everything
          .filter(col("a").between(a1, a2) && col("b").between(b1, b2))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(plain.nonEmpty, s"fixture rectangle [$a1,$a2]x[$b1,$b2] empty")
        assert(pruned == plain, s"rectangle [$a1,$a2]x[$b1,$b2] diverges after append")
      }
    // identical values co-locate across generations: re-appending rows the
    // base already holds must create no new bucket
    val before = DataLayout.readStats(spark, dir).map(_.bucket).toSet
    DataLayout.append(base.limit(50), dir)
    val after = DataLayout.readStats(spark, dir).map(_.bucket).toSet
    assert(after == before, "re-appended duplicate keys opened new buckets")
  }

  test("degenerate constant dimension lays out without error") {
    val dir = Files.createTempDirectory("layout-const").toString
    val df = spark.range(100).selectExpr("id AS a", "CAST(7 AS LONG) AS b")
    DataLayout.writeZOrdered(df, dir, "a", "b", bucketBits = 3)
    val back = DataLayout.readPruned(spark, dir, "a", 10, 19, "b", 0, 100)
    assert(back.count() == 10)
  }

  // --- Bloom-index point lookups over the same layout -------------------

  private lazy val bloomLayoutDir: String = {
    val dir = layoutDir
    BloomIndex.build(spark, dir, "event_id")
    dir
  }

  test("bloom point lookup opens few buckets where min/max stats prune none") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stats = DataLayout.readStats(spark, bloomLayoutDir)
    val probeId = 4242L
    // min/max pruning on the unclustered id column keeps everything
    val byStats = stats.count(s => true) // every bucket's box spans any id
    val probes = Seq(probeId).toDF("event_id")
    val byBloom = BloomIndex.candidateBuckets(spark, bloomLayoutDir, "event_id", probes)
    assert(byBloom.nonEmpty, "bloom lost the probed key's bucket")
    assert(byBloom.size * 4 <= byStats,
      s"bloom kept ${byBloom.size} of $byStats buckets — no skipping")
  }

  test("bloom lookup equals the plain filter; false positives never leak") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val probes = ev.select(col("event_id"))
      .filter(pmod(col("event_id"), lit(37L)) === 0)
    val got = BloomIndex.readLookup(spark, bloomLayoutDir, "event_id", probes)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = ev.filter(pmod(col("event_id"), lit(37L)) === 0)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length} rows")
  }

  test("bloom lookup read is partition-pruned in the physical plan") {
    import spark.implicits._
    val probes = Seq(7L).toDF("event_id")
    val df = BloomIndex.readLookup(spark, bloomLayoutDir, "event_id", probes)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(DataLayout.ZBucketCol),
      s"expected ${DataLayout.ZBucketCol} partition filters in:\n$plan")
  }

  // --- N-dimensional layout ---------------------------------------------

  test("3-dim layout: third-dimension-only predicate still prunes; read is exact") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("layout3-spec").toString
    val ev = Tables.load(spark, sfDir, "events")
    DataLayoutN.writeZOrdered(ev, dir, Seq("ts", "user_id", "value"), bucketBits = 6)
    // value-band only: a (ts, user) 2-D curve cannot prune this at all
    val chosen = DataLayoutN.prunedBuckets(spark, dir, Map("value" -> (0L, 60L)))
    assert(chosen.nonEmpty && chosen.size * 2 <= 64,
      s"third-dim-only predicate kept ${chosen.size} of 64 buckets")
    val got = DataLayoutN.readPruned(spark, dir, Map("value" -> (0L, 60L)))
      .select("event_id").collect().map(_.getLong(0)).sorted
    val want = ev.filter(col("value").cast("long").between(0L, 60L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"${got.length} vs ${want.length} rows")
  }

  test("3-dim random boxes: pruned read equals plain filter for every query") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 3000).map(_ =>
      (rnd.nextInt(1000).toLong, rnd.nextInt(200).toLong, rnd.nextInt(50).toLong))
      .toDF("a", "b", "c")
    val dir = Files.createTempDirectory("layout3-rand").toString
    DataLayoutN.writeZOrdered(df, dir, Seq("a", "b", "c"), bucketBits = 5)
    (1 to 8).foreach { _ =>
      def range(max: Int) = { val lo = rnd.nextInt(max); (lo.toLong, (lo + rnd.nextInt(max - lo)).toLong) }
      val (alo, ahi) = range(1000); val (blo, bhi) = range(200); val (clo, chi) = range(50)
      val got = DataLayoutN.readPruned(spark, dir,
        Map("a" -> (alo, ahi), "b" -> (blo, bhi), "c" -> (clo, chi))).count()
      val want = df.filter(col("a").between(alo, ahi) && col("b").between(blo, bhi) &&
        col("c").between(clo, chi)).count()
      assert(got == want, s"box a[$alo,$ahi] b[$blo,$bhi] c[$clo,$chi]: $got vs $want")
    }
  }

  test("3-dim append: saved curve, widened stats, exact reads") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (0L until 500L).map(i => (i % 100, i % 37, i % 11)).toDF("a", "b", "c")
    val dir = Files.createTempDirectory("layout3-append").toString
    DataLayoutN.writeZOrdered(base, dir, Seq("a", "b", "c"), bucketBits = 4)
    // increment includes out-of-range values that must clamp + widen stats
    val inc = Seq((150L, 50L, 20L), (7L, 7L, 7L)).toDF("a", "b", "c")
    DataLayoutN.append(inc, dir)
    val all = base.union(inc)
    val got = DataLayoutN.readPruned(spark, dir,
      Map("a" -> (0L, 200L), "b" -> (0L, 60L), "c" -> (0L, 30L))).count()
    assert(got == all.count(), s"append lost rows: $got vs ${all.count()}")
    val band = DataLayoutN.readPruned(spark, dir, Map("c" -> (7L, 7L))).count()
    val want = all.filter(col("c") === 7L).count()
    assert(band == want, s"post-append band read: $band vs $want")
  }

  test("3-dim bucket skip is partition pruning in the physical plan") {
    val dir = Files.createTempDirectory("layout3-plan").toString
    DataLayoutN.writeZOrdered(
      Tables.load(spark, sfDir, "events"), dir, Seq("ts", "user_id", "value"), bucketBits = 6)
    val df = DataLayoutN.readPruned(spark, dir, Map("value" -> (0L, 60L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(DataLayoutN.ZBucketCol),
      s"expected ${DataLayoutN.ZBucketCol} partition filters in:\n$plan")
  }

  test("4-dim layout accepts the advertised maximum and reads exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 1500).map(_ =>
      (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
        rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)).toDF("a", "b", "c", "d")
    val dir = Files.createTempDirectory("layout4").toString
    DataLayoutN.writeZOrdered(df, dir, Seq("a", "b", "c", "d"), bucketBits = 4)
    val got = DataLayoutN.readPruned(spark, dir,
      Map("b" -> (10L, 40L), "d" -> (50L, 90L))).count()
    val want = df.filter(col("b").between(10, 40) && col("d").between(50, 90)).count()
    assert(got == want, s"$got vs $want")
  }
}
