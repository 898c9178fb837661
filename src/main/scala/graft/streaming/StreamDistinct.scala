package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Kmv, KmvAgg}

/** Windowed streaming distinct-count through the bounded KMV sketch —
  * "distinct users per window" on an unbounded stream without unbounded
  * state.
  *
  * A streaming `count(DISTINCT …)` is disallowed by Structured Streaming
  * (its state would be the distinct set itself); `approx_count_distinct`
  * works but its HLL state is opaque. [[KmvAgg]] slots straight into a
  * watermarked window aggregation: the per-window state is ≤ k longs,
  * partial buffers merge across micro-batches exactly like they merge
  * across partitions in batch, and the (k-1)/h_k estimate is the SAME
  * deterministic number the batch query computes over the same rows —
  * one sketch implementation, both execution modes.
  *
  * Late rows beyond the watermark are dropped and window state is
  * evicted once the watermark passes, so a stream running for months
  * holds state only for open windows.
  */
object StreamDistinct {

  /** The RAW per-window sketches (`win_start`, `groupCol`, `ks`) — emit
    * these to storage and any coarser scope (day, month, all-time) rolls
    * up later by merging the k-long arrays ([[graft.functions
    * .KmvMergeAgg]]), without replaying the stream. */
  def sketchPerWindow(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      groupCol: String,
      windowLen: String = "1 hour",
      watermark: String = "2 hours",
      k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    stream
      // null keys hash to null and would hit the aggregator's primitive
      // Long input encoder; dropping them matches COUNT(DISTINCT key)'s
      // null semantics
      .filter(col(keyCol).isNotNull)
      .select(col(tsCol), col(groupCol), Kmv.keyHash(col(keyCol)).as("hv"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(groupCol))
      .agg(kmv(col("hv")).as("ks"))
      .select(col("w.start").as("win_start"), col(groupCol), col("ks"))
  }

  /** Estimated distinct `keyCol` per (`window`, `groupCol`) over a
    * watermarked event-time stream. Append-mode-compatible: windows
    * emit once the watermark closes them.
    */
  def distinctPerWindow(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      groupCol: String,
      windowLen: String = "1 hour",
      watermark: String = "2 hours",
      k: Int = 64): DataFrame =
    sketchPerWindow(stream, tsCol, keyCol, groupCol, windowLen, watermark, k)
      .select(col("win_start"), col(groupCol),
        Kmv.estimate(col("ks"), k).as("est_distinct"))
}
