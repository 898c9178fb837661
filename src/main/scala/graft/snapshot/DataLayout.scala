package graft.snapshot

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout + min/max-stats file pruning —
  * the data-SKIPPING half of the 100 TB story. Hash bucketing
  * ([[TargetTable]], [[ShardedExport]]) places rows for point lookups
  * and balanced consumption; it deliberately destroys range locality.
  * Analytical range scans ("events for this user cohort in this week")
  * need the opposite: rows CLUSTERED so that per-file min/max statistics
  * become tight and most files can be skipped without reading them —
  * exactly what Delta's `OPTIMIZE ZORDER BY` and Iceberg's sort orders
  * buy. A single-column sort only prunes on its leading column; the
  * Z-curve interleaves the bits of BOTH dimensions, so a 2-D rectangle
  * query prunes on either (or both) dimensions at once.
  *
  * Scale design:
  *  - Normalization needs only the global min/max of each column — ONE
  *    aggregate row (4 longs) collected, O(1) in the table (and with
  *    parquet aggregate pushdown the min/max scan reads footers only).
  *  - The z-value is a pure per-row bit-interleave projection (no
  *    shuffle, whole-stage codegen); the only exchange is the
  *    `repartition` that groups rows by z-bucket — the same single
  *    shuffle any layout rewrite pays.
  *  - Bucket stats are one bounded hash-agg (≤ 2^bucketBits rows),
  *    persisted as a PARQUET metadata table (the Iceberg `table$files`
  *    idea) — no driver-held state beyond the tiny stats frame, and the
  *    pruned read is planned from stats alone, never from data.
  *  - Pruning itself is Spark partition pruning: the z-bucket is a
  *    parquet partition column, so the chosen-bucket `isin` filter
  *    becomes `PartitionFilters` at the scan and skipped buckets are
  *    never opened, let alone read.
  *
  * The reference ships data to warehouses that do this internally
  * (Snowflake micro-partition pruning, Redshift sort keys — e.g. the
  * sort-key DDL in its redshift table builders); an in-engine layout
  * operator is the Spark-native equivalent.
  */
object DataLayout {

  val ZBucketCol = "_zbucket"
  private val Bits = 16 // rank resolution per dimension → 32-bit z-value

  /** Per-bucket column ranges, read back from the stats table. */
  final case class BucketStats(bucket: Int, aMin: Long, aMax: Long, bMin: Long, bMax: Long)

  /** 16-bit rank of `c` within [mn, mx]. A narrow span (user ids,
    * enum codes) must be scaled UP so its distinctions land in the
    * HIGH rank bits — otherwise they interleave as constant zeros and
    * the curve degenerates to a 1-D sort on the wide column; a wide
    * span (ns timestamps) divides DOWN by a precomputed integer bucket
    * width. Subtraction first keeps values ≤ span (no overflow for any
    * int64 span); the double arithmetic is exact below 2^53 and merely
    * APPROXIMATE ranking above — layout quality, never correctness,
    * depends on the ranks, because pruning consults measured
    * per-bucket stats, not the curve. */
  // shared with [[DataLayoutN]] — one rank definition for every curve
  private[snapshot] def rank16(c: Column, mn: Long, mx: Long): Column = {
    val span = mx - mn
    val raw =
      if (span + 1 <= 65536L) {
        val scale = 65536.0 / (span + 1).toDouble
        floor((c - lit(mn)).cast("double") * scale).cast("long")
      } else {
        val w = span / 65536L + 1L
        ((c - lit(mn)) / lit(w.toDouble)).cast("long")
      }
    // appended rows may fall outside the ranges the layout was built
    // with — clamp so they land in the edge buckets (whose MEASURED
    // stats then widen to cover them; pruning never trusts the curve)
    greatest(lit(0L), least(lit(65535L), raw))
  }

  /** Bucket assignment for a layout's saved constants — the one
    * definition the initial write AND every append share. */
  private def bucketExpr(m: LayoutMeta): Column = {
    val z = interleave(
      rank16(col(m.colA).cast("long"), m.aMn, m.aMx),
      rank16(col(m.colB).cast("long"), m.bMn, m.bMx))
    shiftrightunsigned(z, 2 * Bits - m.bucketBits).cast("int")
  }

  /** Morton interleave of two 16-bit ranks: z bit 2i+1 = a bit i,
    * z bit 2i = b bit i. 32 shift/mask/or terms — a flat codegen
    * expression, no allocation, no UDF. */
  private def interleave(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(a.bitwiseAND(lit(1L << i)), i + 1)
        .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
    }.reduce(_ bitwiseOR _)

  private def dataDir(layoutDir: String): String =
    Paths.get(layoutDir, "data").toString
  private def statsDir(layoutDir: String): String =
    Paths.get(layoutDir, "stats").toString
  private def metaPath(layoutDir: String): java.nio.file.Path =
    Paths.get(layoutDir, "_zorder_meta")

  /** Layout constants captured at [[writeZOrdered]] so appends assign
    * rows with the SAME curve (normalization ranges must not drift
    * between generations or identical values land in different
    * buckets). */
  final case class LayoutMeta(
      colA: String, colB: String, bucketBits: Int,
      aMn: Long, aMx: Long, bMn: Long, bMx: Long)

  private def writeMeta(layoutDir: String, m: LayoutMeta): Unit = {
    java.nio.file.Files.createDirectories(Paths.get(layoutDir))
    java.nio.file.Files.writeString(metaPath(layoutDir),
      s"${m.colA}\n${m.colB}\n${m.bucketBits}\n${m.aMn}\n${m.aMx}\n${m.bMn}\n${m.bMx}\n")
  }

  def readMeta(layoutDir: String): LayoutMeta = {
    val ls = java.nio.file.Files.readString(metaPath(layoutDir)).split("\n")
    LayoutMeta(ls(0), ls(1), ls(2).toInt, ls(3).toLong, ls(4).toLong, ls(5).toLong, ls(6).toLong)
  }

  /** Rewrite `df` under `layoutDir` clustered by the Z-curve over
    * (`colA`, `colB`) into `2^bucketBits` bucket directories, plus the
    * per-bucket min/max stats table. Returns the bucket count. */
  def writeZOrdered(
      df: DataFrame,
      layoutDir: String,
      colA: String,
      colB: String,
      bucketBits: Int = 6): Int = {
    require(bucketBits >= 1 && bucketBits <= 16, s"bucketBits out of range: $bucketBits")
    val r = df
      .agg(
        min(col(colA).cast("long")), max(col(colA).cast("long")),
        min(col(colB).cast("long")), max(col(colB).cast("long")))
      .head()
    val meta = LayoutMeta(colA, colB, bucketBits,
      r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    writeMeta(layoutDir, meta)
    val clustered = df.withColumn(ZBucketCol, bucketExpr(meta))
    clustered
      .repartition(col(ZBucketCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(ZBucketCol)
      .parquet(dataDir(layoutDir))
    // Measured (not curve-theoretic) stats: one bounded hash agg over
    // the clustered frame. At scale these come from the parquet footers
    // the write just produced; recomputing here keeps the local build
    // simple and byte-identical in meaning.
    spark(df).read.parquet(dataDir(layoutDir))
      .groupBy(col(ZBucketCol).as("bucket"))
      .agg(
        min(col(colA).cast("long")).as("aMin"), max(col(colA).cast("long")).as("aMax"),
        min(col(colB).cast("long")).as("bMin"), max(col(colB).cast("long")).as("bMax"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(statsDir(layoutDir))
    1 << bucketBits
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  /** Append an increment to an existing layout WITHOUT a rewrite — the
    * maintenance path a continuously-ingesting 100 TB table needs. New
    * rows are assigned with the layout's SAVED curve constants
    * (out-of-range values clamp into the edge buckets), so identical
    * values always co-locate with the original generation; the bucket
    * stats are widened by an outer min/max merge with the increment's
    * own one-agg stats.
    *
    * Crash-ordering: stats are published BEFORE the data lands. A crash
    * between the two leaves stats looser than the data they describe —
    * pruning then opens a bucket it didn't strictly need, which is
    * correct; the reverse order could SKIP a bucket that holds new rows,
    * which is data loss at read time. */
  def append(df: DataFrame, layoutDir: String): Unit = {
    val m = readMeta(layoutDir)
    val spark = df.sparkSession
    val incStats = df
      .withColumn(ZBucketCol, bucketExpr(m))
      .groupBy(col(ZBucketCol).as("bucket"))
      .agg(
        min(col(m.colA).cast("long")).as("aMin"), max(col(m.colA).cast("long")).as("aMax"),
        min(col(m.colB).cast("long")).as("bMin"), max(col(m.colB).cast("long")).as("bMax"))
      .collect()
      .map(r => BucketStats(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val old = readStats(spark, layoutDir)
    val merged = (old ++ incStats).groupBy(_.bucket).map { case (b, ss) =>
      BucketStats(b, ss.map(_.aMin).min, ss.map(_.aMax).max,
        ss.map(_.bMin).min, ss.map(_.bMax).max)
    }.toSeq.sortBy(_.bucket)
    import spark.implicits._
    merged.toDF("bucket", "aMin", "aMax", "bMin", "bMax")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(statsDir(layoutDir))
    df.withColumn(ZBucketCol, bucketExpr(m))
      .repartition(col(ZBucketCol))
      .write.mode(SaveMode.Append)
      .partitionBy(ZBucketCol)
      .parquet(dataDir(layoutDir))
  }

  /** Stats rows for `layoutDir` — ≤ 2^bucketBits of them, bounded. */
  def readStats(spark: SparkSession, layoutDir: String): Seq[BucketStats] =
    spark.read.parquet(statsDir(layoutDir))
      .select("bucket", "aMin", "aMax", "bMin", "bMax")
      .collect()
      .map(r => BucketStats(r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  /** Buckets whose measured [min,max] box intersects the query
    * rectangle — the ones a pruned read must open. */
  def prunedBuckets(
      stats: Seq[BucketStats],
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Seq[Int] =
    stats
      .filter(s => s.aMin <= aHi && s.aMax >= aLo && s.bMin <= bHi && s.bMax >= bLo)
      .map(_.bucket)
      .sorted

  /** Rectangle read over the layout: stats-pruned bucket selection
    * (a driver-side filter over the bounded stats frame) + the exact
    * residual predicate. The `isin` over [[ZBucketCol]] is a partition
    * filter — non-chosen bucket directories are never opened. */
  def readPruned(
      spark: SparkSession,
      layoutDir: String,
      colA: String, aLo: Long, aHi: Long,
      colB: String, bLo: Long, bHi: Long): DataFrame = {
    val chosen = prunedBuckets(readStats(spark, layoutDir), aLo, aHi, bLo, bHi)
    spark.read.parquet(dataDir(layoutDir))
      .filter(col(ZBucketCol).isin(chosen.map(Integer.valueOf): _*))
      .filter(col(colA).cast("long").between(aLo, aHi) && col(colB).cast("long").between(bLo, bHi))
      .drop(ZBucketCol)
  }
}
