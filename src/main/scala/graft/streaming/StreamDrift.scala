package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.QualityQueries

/** Streaming distribution-drift monitoring — the continuous face of
  * the batch `corpus_drift` query: each arriving micro-batch's hashed
  * token distribution is χ²-scored against a baseline trained on the
  * landed corpus (train nightly in batch, score continuously — the
  * same split as [[StreamClassifier]], [[StreamLmScore]], and
  * [[StreamAnomaly]]).
  *
  * Spark-first shape: the baseline is ONE 64-row (dim, cnt) frame —
  * corpus-sublinear model state that broadcasts into every micro-batch
  * join — and scoring is one tokenize pass + one dim-keyed hash agg
  * over the batch, then the shared exact-integer χ² chain
  * ([[QualityQueries.chi2Against]]), so stream ≡ batch dim-for-dim.
  * Streaming STATE is zero. A rising per-batch Σχ² is the alarm that
  * the ingest's vocabulary no longer matches what the corpus models
  * (and downstream models like the quality gate) were built on; the
  * high-χ² dims name the drifted vocabulary slice.
  */
object StreamDrift {

  /** Train the baseline distribution from the landed corpus. */
  def baseline(docs: DataFrame): DataFrame =
    QualityQueries.dimCounts(docs)

  /** Score one `(doc_id, text)` micro-batch (or any batch frame)
    * against the baseline: (dim, o1 = batch count, o2 = baseline
    * count, chi2). */
  def scoreBatch(batch: DataFrame, base: DataFrame): DataFrame =
    QualityQueries.chi2Against(QualityQueries.dimCounts(batch), base)

  /** Start scoring `docs` (a STREAMING `(doc_id, text)` frame); each
    * micro-batch's per-dim χ² frame is handed to `sink`. Pass
    * `checkpoint` in production (see [[StreamClassifier.scored]]). */
  def scored(docs: DataFrame, base: DataFrame,
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(scoreBatch(batch, base), id)
      }
      .start()
  }
}
