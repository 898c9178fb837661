package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replication verification — the sync-diff-inspector companion the
  * reference ecosystem runs after tidb2dw copies a table (chunked
  * count + checksum compare; cf. the reference's loadinfo/metrics
  * surface, which records what WAS copied but cannot prove the copy is
  * still intact). Both table images collapse to one bounded summary
  * row per key-range bucket — `(rows, Σ row-hash)` — and only the
  * summaries join: a 100 TB source and target each cost ONE scan + one
  * hash agg, the exchange carries N_buckets rows, and diverged buckets
  * localize re-sync work to the key ranges that actually drifted
  * (the same reason [[graft.snapshot.TargetTable]] merges
  * bucket-scoped).
  *
  * The checksum is an ORDER-INDEPENDENT sum of a 60-bit md5 row hash
  * (the [[graft.functions.Kmv]] construction — reproducible bit-for-bit
  * in DuckDB, so the whole diff is oracle-checkable), summed in
  * DECIMAL(38,0): ~2^60 per row never overflows 38 digits below ~10^18
  * rows per bucket, and both engines render the decimal identically.
  */
object TableDiff {

  /** Per-bucket `(bucket, rows, hsum)` summary: `pmod(key, buckets)`
    * ranges (plain modulo — engine-portable, and contiguous-id PKs
    * spread evenly; a production deployment may swap any deterministic
    * bucketing both sides agree on). `rowRepr` must render the row
    * canonically — same column order, same formatting — on every
    * engine that participates in the diff. */
  def bucketSummary(df: DataFrame, keyCol: String, rowRepr: Column, buckets: Int): DataFrame =
    df.select(
        pmod(col(keyCol), lit(buckets)).cast("int").as("bucket"),
        conv(substring(md5(rowRepr), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"),
        sum(col("h").cast("decimal(38,0)")).as("hsum"))

  /** Diverged bucket ids from a [[diff]] result — the bounded work list
    * a repair pass operates on. */
  def divergedBuckets(d: DataFrame): Seq[Int] =
    d.filter(col("status") === "diff").select(col("bucket"))
      .collect().map(_.getInt(0)).toSeq.sorted

  /** Re-sync the diverged buckets: the repaired target keeps its intact
    * buckets and takes the source's rows for every bucket in
    * `buckets` — bucket-scoped DELETE+INSERT, the same partition-scoped
    * rewrite shape as [[graft.snapshot.TargetTable.mergeVersion]].
    * Cost is O(diverged buckets), never O(table): both scans carry a
    * bucket-membership predicate that pushes to the storage layer
    * (partition pruning when the table is bucket-partitioned). */
  def repair(src: DataFrame, dst: DataFrame, keyCol: String,
      buckets: Seq[Int], numBuckets: Int): DataFrame = {
    val b = pmod(col(keyCol), lit(numBuckets)).cast("int")
    val bs = buckets.map(Integer.valueOf)
    dst.filter(!b.isin(bs: _*))
      .unionByName(src.filter(b.isin(bs: _*)))
  }

  /** Full-outer compare of two summaries: one row per bucket present on
    * either side, with `ok`/`diff` status. Missing buckets read as
    * (0 rows, 0 sum) so a bucket that exists only on one side reports
    * `diff`, not null. */
  def diff(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = src.select(col("bucket"), col("rows").as("src_rows"), col("hsum").as("src_hsum"))
    val d = dst.select(col("bucket"), col("rows").as("dst_rows"), col("hsum").as("dst_hsum"))
    s.join(d, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("dst_rows"), lit(0L)).as("dst_rows"),
        coalesce(col("src_hsum"), lit(0).cast("decimal(38,0)")).as("src_hsum"),
        coalesce(col("dst_hsum"), lit(0).cast("decimal(38,0)")).as("dst_hsum"))
      .withColumn("status",
        when(col("src_rows") === col("dst_rows") && col("src_hsum") === col("dst_hsum"), "ok")
          .otherwise("diff"))
      // checksums travel as STRINGS: a 21-digit sum exceeds every
      // engine-portable integer (and pandas narrows DECIMAL(38) to
      // float64, losing the low digits), so the digits themselves are
      // the only faithful cross-engine wire format
      .withColumn("src_hsum", col("src_hsum").cast("string"))
      .withColumn("dst_hsum", col("dst_hsum").cast("string"))
      .orderBy(col("bucket"))
  }
}
