package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.BpeQueries

/** Streaming BPE token counting — the ingest-time face of
  * `BpeQueries.encodeCorpus`: documents are token-counted AS THEY ARRIVE
  * against a tokenizer trained nightly in batch (`trainMerges`), the
  * same train/apply split as the quality classifier and the bigram LM.
  *
  * Spark-first shape: the model is the k-pair merge list (driver-held —
  * a tokenizer IS model state), and encoding is word-local, so each
  * micro-batch runs the batch encoder via `foreachBatch`: batch-local
  * word vocabulary → in-array merge folds → one doc-keyed count agg.
  * Streaming STATE is zero — nothing is keyed across batches — and the
  * per-batch bill is O(batch words × merges), independent of corpus
  * size. Token counts feed the same budget/packing joins downstream
  * whether they were computed at ingest or in the nightly batch.
  */
object StreamBpeEncode {

  /** Start token-counting `docs` (a STREAMING `(doc_id, text)` frame)
    * with the trained `merges`; each micro-batch's
    * `(doc_id, n_words, n_tokens)` frame goes to `sink`. */
  def encoded(docs: DataFrame, merges: Seq[(String, String)],
      checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream.outputMode("append")
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        sink(BpeQueries.encodeCorpus(batch, merges), id)
      }
      .start()
  }
}
