package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Cms

/** Windowed streaming Count-Min sketch — per-key frequency estimation on
  * an unbounded stream with state that never grows past d×w counters per
  * open window.
  *
  * A streaming `groupBy(key).count()` holds one state row per distinct
  * key — unbounded on a high-cardinality stream. The CMS inverts that:
  * the stream folds into a FIXED d×w counter table per window (this is
  * just a windowed count over (window, j, bucket) — plain partial-agg
  * streaming state), and any key's count is estimated after emission by
  * `min` over its d buckets, guaranteed ≥ the true count. Same md5
  * construction as the batch query ([[graft.functions.Cms]]), so the
  * emitted sketch is bit-identical to a batch build over the same rows.
  */
object StreamFrequency {

  /** d×w sketch rows per (`window`) over a watermarked event-time
    * stream: (win_start, j, b, c). Append-mode-compatible; downstream
    * estimates are `min(c)` over a key's d (j, bucket(j,key)) cells,
    * with absent cells read as 0. */
  def sketchPerWindow(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLen: String = "1 hour",
      watermark: String = "2 hours",
      depth: Int = Cms.DefaultDepth,
      width: Long = Cms.DefaultWidth): DataFrame =
    stream
      .select(col(tsCol), Cms.rows(col(keyCol), depth).as("j"), col(keyCol).as("k"))
      .select(col(tsCol), col("j"), Cms.bucket(col("j"), col("k"), width).as("b"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("win_start"), col("j"), col("b"), col("c"))
}
