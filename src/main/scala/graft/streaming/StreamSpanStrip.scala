package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.DedupQueries

/** Streaming duplicated-span removal against a landed corpus — the
  * ingest-time face of `dedup_span_incremental`: as documents arrive,
  * every fixed-width span already present in the corpus span index is
  * stripped and the document re-emitted from its surviving spans, so
  * boilerplate the corpus has already seen never lands twice.
  *
  * Spark-first shape: the span index is ONE static distinct-span frame
  * (production persists it as parquet and rebuilds on compaction — the
  * `NearDupIndex` lifecycle), so each micro-batch runs the exact batch
  * core via `foreachBatch`: hash-keyed anti-join of the batch's spans
  * against the index plus the same min(struct) first-occurrence
  * election WITHIN the micro-batch, then per-doc reassembly. Streaming
  * STATE is zero — nothing is keyed across batches — so the query runs
  * forever at any rate; duplicates that straddle micro-batches are
  * caught at the next index rebuild, exactly like the nightly batch
  * recompute (same horizon trade as `StreamSemanticDedup`).
  */
object StreamSpanStrip {

  /** The persisted serving index: the corpus's distinct spans. */
  def buildIndex(corpus: DataFrame): DataFrame =
    DedupQueries.corpusSpanSet(corpus)

  /** Strip one batch of `(doc_id, text)` docs against the index —
    * batch callers and the stream share this exact chain. Emits
    * `(doc_id, n_seg, n_kept, text_kept)`. */
  def stripBatch(batch: DataFrame, index: DataFrame): DataFrame =
    DedupQueries.spanStripAgainst(batch, index)

  /** Start stripping `docs` (a STREAMING `(doc_id, text)` frame)
    * against `index`; each micro-batch's rebuilt documents are handed
    * to `sink`. */
  def stripped(docs: DataFrame, index: DataFrame,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(stripBatch(batch, index), id)
      }
      .start()
  }
}
