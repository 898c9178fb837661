package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Per-window streaming top-k keys by count — TWO CHAINED stateful
  * aggregations (Spark's multiple-stateful-operator support): a
  * watermarked (window, key) count, then a window-keyed bounded
  * [[TopKAgg]] over those counts, emitted when the watermark closes the
  * window.
  *
  * Why this shape at scale: the naive "rank per window" needs the
  * window's full key-count table sorted in one place; the TopKAgg chain
  * keeps per-window state at |keys-in-window| count rows (first agg,
  * the unavoidable minimum for exact counts) plus ≤k entries in the
  * top-k buffer (second agg) — the exchange between them carries one
  * row per (window, key) and the output one row per rank, never a sort
  * of the whole window. Same aggregate the batch `window_top_events`
  * family uses, so stream ≡ batch rank-for-rank over the same rows
  * (`StreamTopKSpec`).
  */
object StreamTopK {

  /** (win_start, rank, key, cnt) rows for the top `k` keys of each
    * closed window over a watermarked event-time stream. */
  def topKPerWindow(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      k: Int,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("w"))
      .agg(topk(col("cnt").cast("double"), col("key")).as("tk"))
      .select(col("w.start").as("win_start"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("win_start"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as("key"), col("t.sim").cast("long").as("cnt"))
  }
}
