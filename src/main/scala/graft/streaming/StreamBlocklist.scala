package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** Streaming content-blocklist enforcement — the ingest-time face of
  * `CurationQueries.corpusBlocklist`: takedown/opt-out lists must apply
  * to documents AS THEY ARRIVE, not only in the nightly batch job.
  *
  * Spark-first shape: the blocklist's bloom words are a driver-held
  * literal (fixed-size bits, m/64 longs), so the bloom test is a
  * STATELESS per-row projection on the stream. Bloom-negative rows pass
  * straight through with no join at all; only bloom-positive rows (true
  * matches + ~1 % false positives) enter the stream-static anti-join
  * against the exact blocklist table, which removes the FPs — the
  * operator is exact, the bloom only decides who pays the join.
  * Stream-static joins re-evaluate the static side per micro-batch, so
  * a refreshed blocklist table applies without restarting the query,
  * and streaming STATE stays zero (nothing is stream-stream here).
  */
object StreamBlocklist {

  /** Drop every stream row whose `fpCol` fingerprint appears in `block`
    * (a STATIC frame with column `bfp`); `words` is the bloom built
    * over the same fingerprints (see [[graft.functions.BloomAgg]]). */
  def cleanStream(docs: DataFrame, block: DataFrame, words: Array[Long],
      fpCol: String = "fp"): DataFrame = {
    // Once-form: fpCol is often a projected expression (md5 chain,
    // domain regexes) that pushdown would otherwise inline per probe
    val maybe = Bloom.mayContainOnce(words, xxhash64(col(fpCol)))
    val cleared = docs.filter(maybe)
      .join(block, col(fpCol) === col("bfp"), "left_anti")
    docs.filter(!maybe).unionByName(cleared)
  }
}
