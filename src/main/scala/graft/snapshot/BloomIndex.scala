package graft.snapshot

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bloom, BloomAgg}

/** Per-bucket Bloom-filter data skipping over a [[DataLayout]] — the
  * point-lookup complement to its min/max stats (the Delta/Databricks
  * "bloom filter index" pattern).
  *
  * Min/max pruning answers RANGE predicates on the clustering
  * dimensions; a needle-in-haystack equality probe on a high-cardinality
  * UNCLUSTERED column (event_id here) intersects every bucket's [min,
  * max] box and prunes nothing. One fixed-size Bloom filter per bucket
  * over that column fixes it: a probe opens only the buckets whose
  * filter MAY contain the key — ~1 of them plus rare false positives —
  * and the exact residual predicate keeps the read exact (no false
  * negatives by construction, false positives filtered after the scan).
  *
  * Scale shape: the index build is ONE map-side-combinable hash-agg
  * over the layout (bitwise-OR partial merge, [[BloomAgg]]), emitting
  * 2^bucketBits rows × m/64 longs — bounded metadata whatever the data
  * size, same contract as the stats table. Probing joins the probe keys
  * against that bounded frame (broadcast), so bucket selection costs
  * O(probes × buckets) bit tests and never touches data files; the
  * read then partition-filters to the selected buckets — unselected
  * directories are never opened. On [[DataLayout.append]], rebuild the
  * index (one agg over the layout) — bloom words OR-merge, so an
  * incremental build over just the appended files is the same
  * aggregation; correctness never depends on it (a stale index can
  * only arise from skipping the rebuild, and the residual predicate
  * still filters exactly within opened buckets — but a MISSING key's
  * bucket could then be wrongly skipped, so the rebuild is part of the
  * append contract, ordered before the data lands like the stats).
  */
object BloomIndex {

  private def bloomDir(layoutDir: String, keyCol: String): String =
    s"$layoutDir/bloom_$keyCol"

  private def dataDir(layoutDir: String): String = s"$layoutDir/data"

  /** Build (or rebuild) the per-bucket Bloom index for `keyCol`. */
  def build(spark: SparkSession, layoutDir: String, keyCol: String): Unit = {
    val bloomAgg = udaf(new BloomAgg())
    spark.read.parquet(dataDir(layoutDir))
      .select(col(DataLayout.ZBucketCol).as("bucket"),
        xxhash64(col(keyCol)).as("h"))
      .groupBy(col("bucket"))
      .agg(bloomAgg(col("h")).as("words"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(bloomDir(layoutDir, keyCol))
  }

  /** Buckets whose filter may contain any of `probes`' keys — the ones
    * a point-lookup read must open. Bounded: the index frame is
    * 2^bucketBits rows; probes broadcast against it. */
  def candidateBuckets(spark: SparkSession, layoutDir: String, keyCol: String,
      probes: DataFrame): Seq[Int] = {
    val idx = spark.read.parquet(bloomDir(layoutDir, keyCol))
    idx.join(broadcast(probes.select(xxhash64(col(keyCol)).as("h"))),
        Bloom.mayContainCol(col("words"), col("h")))
      .select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
  }

  /** Point-lookup read: bloom-select buckets, partition-filter the scan
    * to them (unselected directories never open), then apply the exact
    * semi-join residual so false positives cannot leak. */
  def readLookup(spark: SparkSession, layoutDir: String, keyCol: String,
      probes: DataFrame): DataFrame = {
    val chosen = candidateBuckets(spark, layoutDir, keyCol, probes)
    spark.read.parquet(dataDir(layoutDir))
      .filter(col(DataLayout.ZBucketCol).isin(chosen.map(Integer.valueOf): _*))
      .join(broadcast(probes.select(col(keyCol))), Seq(keyCol), "left_semi")
      .drop(DataLayout.ZBucketCol)
  }
}
