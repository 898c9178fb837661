package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.DsirQueries

/** Streaming DSIR importance scoring — the ingest-time face of
  * `corpus_dsir_score`: documents are scored AS THEY ARRIVE against the
  * hashed-n-gram importance model pretrained on the landed corpus
  * (train nightly in batch, apply continuously — the same train/apply
  * split `StreamClassifier` and `StreamLmScore` use).
  *
  * Spark-first shape: the model is one DsirBuckets-row weight frame
  * plus a fallback scalar ([[DsirQueries.DsirModel]]), so each
  * micro-batch runs the batch scorer via `foreachBatch` — token
  * explode, one broadcast join against the weights, one doc-keyed hash
  * agg. Streaming STATE is zero: nothing is keyed across batches, so
  * the query runs forever at any rate, and stream-scored ≡ batch-scored
  * doc-for-doc (`StreamDsirScoreSpec`). A falling mean importance score
  * per micro-batch is the natural signal that arrivals are drifting
  * away from the target distribution the model was fit to.
  */
object StreamDsirScore {

  /** Start scoring `docs` (a STREAMING `(doc_id, lang, text)` frame)
    * against `model`; each micro-batch's scored frame is handed to
    * `sink`. Pass `checkpoint` in production: without it a restart
    * rewinds offsets and foreachBatch epoch ids restart at 0, which
    * breaks any epoch-keyed exactly-once sink downstream. */
  def scored(docs: DataFrame, model: DsirQueries.DsirModel,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(DsirQueries.scoreWithDsir(batch, model), id)
      }
      .start()
  }
}
