package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.TextQueries

/** Streaming CCNet bucketing — the ingest-time face of
  * `text_ccnet_bucket`: arriving documents are scored against the
  * per-language bigram LM pretrained on the landed corpus and split
  * head/middle/tail at the trained tercile cuts (train nightly, apply
  * continuously — exactly how the CCNet pipeline processes each new
  * CommonCrawl snapshot shard, and the same train/apply split
  * `StreamLmScore` / `StreamClassifier` / `StreamDsirScore` use).
  *
  * Spark-first shape: the model is three corpus-sublinear per-language
  * frames plus a langs×2 cut table ([[TextQueries.CcnetModel]]), so
  * each micro-batch runs the batch bucketer via `foreachBatch` — pair
  * explode, left joins into the LM (unseen bigrams take the smoothed
  * floor), one doc-keyed hash agg, a broadcast cut join. Streaming
  * STATE is zero; stream-bucketed ≡ batch-bucketed doc-for-doc
  * (`StreamCcnetBucketSpec`). The per-batch head/middle/tail mix is
  * the natural drift signal — a swelling tail means arrivals no longer
  * match the corpus the LM was trained on.
  */
object StreamCcnetBucket {

  /** Start bucketing `docs` (a STREAMING `(doc_id, lang, text)` frame)
    * against `model`; each micro-batch's bucketed frame is handed to
    * `sink`. Pass `checkpoint` in production: without it a restart
    * rewinds offsets and epoch ids restart at 0, which breaks any
    * epoch-keyed exactly-once sink downstream. */
  def bucketed(docs: DataFrame, model: TextQueries.CcnetModel,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(TextQueries.bucketAgainst(batch, model), id)
      }
      .start()
  }
}
