package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.FrameNeardupIndex

/** Streaming sampled-frame near-duplicate detection against a landed
  * media corpus — the continuous face of `mm_frame_neardup_incremental`
  * and the first streaming face of the multimodal family: as payloads
  * arrive, fingerprint their sampled frames, probe the persisted
  * [[FrameNeardupIndex]], and emit every verified (doc, corpus-match,
  * frame-Jaccard) pair in append mode.
  *
  * Spark-first scale design (the `StreamNearDup` recipe applied to the
  * codec boundary):
  *   - The fingerprint array is a PER-ROW expression pipeline
  *     ([[FrameNeardupIndex.rowFrameFps]], bounded ≤ ⌈32/stride⌉ entries
  *     per payload) — zero shuffle and zero state to reach a probe key,
  *     and bit-identical to the batch/oracle derivation so stream ≡
  *     batch (pinned by `StreamFrameNeardupSpec`).
  *   - The index probe is a stream-STATIC inner join: the corpus side
  *     never re-shuffles per micro-batch.
  *   - The only state is `dropDuplicatesWithinWatermark` over candidate
  *     (doc, corpus-match) pairs — multiple shared fingerprints collapse
  *     to one pair exactly like the batch `.distinct()`, but the state
  *     EVICTS at the horizon instead of growing with the stream.
  *   - Verification intersects the two bounded per-doc arrays (the
  *     row's own and the index's), so no second index pass and no
  *     stateful count.
  */
object StreamFrameNeardup {

  /** Match a streaming frame carrying (`idCol`, `tsCol`: event-time
    * timestamp, `contentCol`: binary payload) against the index. Emits
    * one row per verified pair: (`idCol`, ts, `dup_of`, `n_shared`,
    * `frame_jaccard_e6`), append mode. Re-deliveries of the same
    * (doc, match) pair within `horizon` are suppressed by the
    * watermarked dedup state. */
  def matchedStream(
      media: DataFrame,
      index: FrameNeardupIndex,
      horizon: String = "1 hour",
      idCol: String = "doc_id",
      tsCol: String = "ingest_ts",
      contentCol: String = "content"): DataFrame = {
    val withFps = media
      .withWatermark(tsCol, horizon)
      .withColumn("fa", FrameNeardupIndex.rowFrameFps(col(contentCol)))
      .select(col(idCol), col(tsCol), col("fa"), explode(col("fa")).as("frame_fp"))
    withFps
      .join(index.frames.select(col("frame_fp"), col("doc_id").as("dup_of")),
        Seq("frame_fp"))
      .select(col(idCol), col(tsCol), col("fa"), col("dup_of"))
      // candidate distinct, stream edition: bounded, watermark-evicted
      .dropDuplicatesWithinWatermark(idCol, "dup_of")
      .join(index.fpsets.select(col("doc_id").as("dup_of"), col("fps").as("fb")),
        Seq("dup_of"))
      .select(col(idCol), col(tsCol), col("dup_of"),
        size(array_intersect(col("fa"), col("fb"))).cast("long").as("n_shared"),
        size(col("fa")).cast("long").as("na"), size(col("fb")).cast("long").as("nb"))
      .filter(col("n_shared") >= FrameNeardupIndex.MinShared)
      .select(col(idCol), col(tsCol), col("dup_of"), col("n_shared"),
        (col("n_shared") * lit(1000000L) /
          (col("na") + col("nb") - col("n_shared"))).cast("long").as("frame_jaccard_e6"))
  }
}
