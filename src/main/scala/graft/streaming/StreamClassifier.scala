package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextQueries

/** Streaming quality-classifier gating — the ingest-time face of
  * `text_classifier_score`: documents are scored AS THEY ARRIVE against
  * the linear model pretrained on the landed corpus (train nightly in
  * batch, apply continuously — the fastText-gate deployment shape, and
  * the same train/apply split `StreamLmScore` and `StreamAnomaly` use).
  *
  * Spark-first shape: the model is one ClsDims-row weight frame plus
  * three scalars ([[TextQueries.ClsModel]]), so each micro-batch runs
  * the batch scorer via `foreachBatch` — hashed-TF extraction, one
  * broadcast join against the weights, one doc-keyed hash agg, a
  * literal-threshold compare. Streaming STATE is zero: nothing is keyed
  * across batches, so the query runs forever at any rate, and
  * stream-scored ≡ batch-scored doc-for-doc (`StreamClassifierSpec`).
  * The keep/drop fraction per micro-batch is the natural drift signal —
  * a collapsing keep rate means the corpus the gate was trained on no
  * longer matches the stream.
  */
object StreamClassifier {

  /** Start scoring `docs` (a STREAMING `(doc_id, text)` frame) against
    * `model`; each micro-batch's scored frame is handed to `sink`.
    * Pass `checkpoint` in production: without it a restart begins at a
    * fresh temp checkpoint, so offsets rewind and foreachBatch epoch
    * ids restart at 0 — which breaks any epoch-keyed exactly-once sink
    * (a redelivered "epoch 0" marker would drop the new batch). */
  def scored(docs: DataFrame, model: TextQueries.ClsModel,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(TextQueries.scoreWithClassifier(batch, model), id)
      }
      .start()
  }
}
