package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest-time deduplication for a document pipeline — the
  * streaming face of `DedupQueries.dedupExact` (north-star LLM-pipeline
  * op): as documents arrive, normalize the text, hash it, and keep only
  * the first occurrence of each content hash.
  *
  * Spark-first state design: `dropDuplicatesWithinWatermark` keys the
  * dedup state by content hash and EVICTS entries once the watermark
  * passes their event time + horizon — state is bounded by the dedup
  * window, not the stream's lifetime, which is what makes continuous
  * ingest at 100 TB/day feasible (a plain `dropDuplicates` on a stream
  * grows state forever). Cross-window duplicates are the batch job's
  * business (`dedup_exact` over the landed table); the stream's contract
  * is "no duplicates within the horizon", the same split a production
  * ingest pipeline makes.
  */
object StreamDedup {

  /** Normalized md5 content hash — identical to the batch
    * `dedup_exact` so stream- and batch-dedup agree on identity. */
  def contentHash(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Deduplicate a streaming frame carrying (`tsCol`: event-time
    * timestamp, `textCol`: document text) within `horizon`. Emits the
    * input columns + `content_hash`, first occurrence per hash only. */
  def dedupedStream(
      docs: DataFrame,
      horizon: String = "1 hour",
      tsCol: String = "ingest_ts",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", contentHash(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
}
