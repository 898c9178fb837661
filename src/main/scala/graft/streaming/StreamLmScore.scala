package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextQueries

/** Streaming perplexity scoring — the ingest-time face of
  * `text_lm_score`: documents are scored AS THEY ARRIVE against a
  * bigram LM pretrained on the landed corpus (train nightly in batch,
  * apply continuously on the stream — the standard split).
  *
  * Spark-first shape: the model is two static corpus-sublinear frames
  * plus one scalar (see [[TextQueries.LmModel]]), so each micro-batch
  * runs the batch scorer via `foreachBatch` — explode to bigram pairs,
  * two stream-static left joins against the model (AQE broadcasts them
  * while they fit), one bounded hash agg per doc. Streaming STATE is
  * zero: nothing is keyed across batches, so the query runs forever at
  * any rate. Unseen bigrams take the smoothed OOV floor and are counted
  * per doc — the natural drift signal (rising `oov_bigrams` means the
  * corpus the model was trained on no longer matches the stream).
  */
object StreamLmScore {

  /** Start scoring `docs` (a STREAMING `(doc_id, text)` frame) against
    * `model`; each micro-batch's scored frame is handed to `sink`.
    * Pass `checkpoint` in production: a fresh temp checkpoint on
    * restart rewinds offsets and restarts epoch ids at 0, breaking any
    * epoch-keyed exactly-once sink downstream. */
  def scored(docs: DataFrame, model: TextQueries.LmModel,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(TextQueries.scoreAgainst(batch, model), id)
      }
      .start()
  }
}
