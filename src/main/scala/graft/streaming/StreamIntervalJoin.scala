package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join: correlate two live event streams on a
  * key within an event-time window (view→click attribution, request→
  * response pairing, CDC-change→CDC-change correlation).
  *
  * The reference engine has no joins at all (SURVEY §2.3 — its only
  * join semantics live inside warehouse MERGE SQL); this is the
  * beyond-reference streaming face of the join family. Structured
  * Streaming executes it with symmetric hash-join state on both sides;
  * the WATERMARK plus the two-sided TIME BOUND are what make that state
  * finite — each side evicts rows once the other side's watermark
  * passes `upper`, so state size is (arrival rate × window), not the
  * stream so far. Without the time bound Spark would have to keep both
  * streams forever (and rejects outer joins outright).
  *
  * Scale: state is keyed by join key and lives in the state store —
  * partitioned by key hash across executors, linear in window size.
  * The join itself shuffles both sides on the key once per micro-batch.
  *
  * Column names on the two sides must be disjoint (standard Spark
  * self-join hygiene); the condition is an SQL expr over both schemas.
  */
object StreamIntervalJoin {

  /** `left ⨝ right` where `leftKey = rightKey` and `rightTs` lies in
    * `[leftTs + lower, leftTs + upper]` (SQL INTERVAL strings, e.g.
    * `"0 seconds"`, `"10 minutes"`). Both sides get `watermark` as
    * their event-time watermark. `joinType`: `"inner"` or the outer
    * variants (`"left_outer"` etc. — unmatched rows emit once the
    * watermark closes their window). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lower: String,
      upper: String,
      watermark: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTs >= $leftTs + INTERVAL $lower AND " +
        s"$rightTs <= $leftTs + INTERVAL $upper"), joinType)
  }
}
