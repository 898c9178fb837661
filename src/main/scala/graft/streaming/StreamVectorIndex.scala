package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.VectorQueries
import graft.snapshot.ShardedExport

/** Continuous IVF index maintenance: vectors arriving on a stream are
  * assigned to their nearest coarse centroid with the SAME broadcast +
  * `max_by` hash-agg the batch index build uses (never a window), and
  * appended into the inverted-list layout exactly-once — so a
  * backfilled index and a live-maintained one agree row-for-row and the
  * batch query path ([[VectorQueries.probeLists]]) runs unchanged over
  * either.
  *
  * The landing layer IS [[StreamShardedExport]]'s marker algebra: an
  * inverted-list table is a sharded export whose partition column is
  * the DENSE LIST INDEX of the assigned centroid instead of a key hash
  * (`commitWithShards`). That buys, for free: per-epoch idempotent
  * commits (crash/redelivery lands nothing twice), crash-orphan
  * invisibility, small-file compaction with reader-side marker algebra
  * while the stream keeps committing, and a no-scan manifest of rows
  * per list — the small-file + exactly-once story a 12 s trigger needs
  * at any rate.
  *
  * Scale shape: per-batch cost is one broadcast of the C-row centroid
  * frame + one map-side-combinable hash-agg over the batch; per-epoch
  * bookkeeping is one marker file; nothing is keyed across batches.
  * The centroid set is FROZEN model state (C rows, the IVF contract —
  * retraining is an index rebuild, not maintenance), so the dense list
  * mapping is deterministic across batches, backfill, and engines.
  */
object StreamVectorIndex {

  /** Dense list index per centroid id — bounded model state (C rows),
    * deterministic: rank of cent_id ascending. */
  def listIndex(cents: DataFrame): Map[Long, Int] =
    cents.select(col("cent_id")).collect().map(_.getLong(0)).sorted.zipWithIndex.toMap

  /** Start continuously indexing `vecs` (a STREAMING frame of
    * (vec_id, embedding)) into the inverted-list table at `outDir`. */
  def start(vecs: DataFrame, cents: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery = {
    val idx = listIndex(cents) // resolve the frozen model once, up front
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatch(batch, cents, idx, outDir, id)
        ()
      }
      .start()
  }

  /** Idempotently assign + land one micro-batch of vectors; returns
    * false if `epochId` was already committed (redelivery no-op). */
  def commitBatch(batch: DataFrame, cents: DataFrame, idx: Map[Long, Int],
      outDir: String, epochId: Long): Boolean = {
    val toList = typedLit(idx)
    val assigned = VectorQueries.assignNearest(batch, cents)
      .withColumn(ShardedExport.ShardCol,
        element_at(toList, col("cent_id")).cast("int"))
    StreamShardedExport.commitWithShards(assigned, outDir, idx.size, epochId)
  }

  /** Every committed (vec_id, embedding, cent_id) row — the same frame
    * the batch build persists, so [[VectorQueries.probeLists]] queries
    * it unchanged. */
  def readIndex(spark: SparkSession, outDir: String): DataFrame =
    StreamShardedExport.readAll(spark, outDir)

  /** One inverted list, partition-pruned: only `centId`'s directory is
    * opened (the probe-side read pattern — NProbe list dirs per probe,
    * never the whole index). */
  def readList(spark: SparkSession, outDir: String, idx: Map[Long, Int],
      centId: Long): DataFrame =
    StreamShardedExport.readShard(spark, outDir, idx(centId))

  /** Fold accumulated per-epoch files into one file per list — the
    * live stream keeps committing alongside (see
    * [[StreamShardedExport.compact]]'s marker algebra). */
  def compact(spark: SparkSession, outDir: String, idx: Map[Long, Int]): Option[Long] =
    StreamShardedExport.compact(spark, outDir, idx.size)

  /** Committed rows per list index, from markers alone — no data scan. */
  def manifest(outDir: String): Map[Int, Long] =
    StreamShardedExport.manifest(outDir)
}
