package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, NearDupIndex}

/** Streaming near-duplicate detection against a landed corpus — the
  * streaming face of `dedup_incremental`: as documents arrive, compute
  * their MinHash band keys, probe the persisted [[NearDupIndex]], and
  * emit every verified (doc, corpus-match, jaccard) pair in append mode.
  *
  * Spark-first scale design:
  *   - The signature is a PER-ROW expression pipeline (array transforms
  *     over the shingle hashes) — zero shuffle and zero state to reach a
  *     band key, unlike the batch path's explode + hash-agg, which a
  *     stream cannot run without a stateful aggregation. Both paths use
  *     the identical md5/`HashParams` recipe, so stream ≡ batch
  *     bit-for-bit (pinned by `StreamNearDupSpec`).
  *   - The index probe is a stream-STATIC inner join: the corpus side
  *     never re-shuffles per micro-batch, and its oversized-bucket skew
  *     cap was already applied at index build time.
  *   - The only state is `dropDuplicatesWithinWatermark` over candidate
  *     (doc, corpus-match) pairs — bands collapse to distinct pairs
  *     exactly like the batch `.distinct()`, but the state EVICTS at the
  *     horizon instead of growing with the stream's lifetime.
  */
object StreamNearDup {
  import DedupQueries.{toks, shingles3, BandRows, HashParams, MinhashK, Prime}

  /** Per-row shingle-hash set: md5-derived 32-bit hashes of the 3-gram
    * shingles, distinct — the row-local equivalent of the batch
    * `shingleHashes` + `collect_set`. */
  private[graft] def rowShingleSet(text: Column): Column =
    array_distinct(transform(shingles3(toks(text)),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")))

  /** Per-row LSH band keys from the shingle-hash set: for each of the k
    * permutations take the array-min (the row-local MinHash), then pack
    * `BandRows` signature slots per band key — same layout and same
    * string rendering as the batch `bandKeys`. */
  private[graft] def rowBandKeys(hs: Column): Column = {
    val mh = HashParams.map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % Prime))
    }
    array((0 until MinhashK / BandRows).map { bandIdx =>
      val slots = (0 until BandRows).map(r => mh(bandIdx * BandRows + r))
      struct(lit(bandIdx).as("band"), concat_ws("_", slots: _*).as("bkey"))
    }: _*)
  }

  /** Match a streaming frame carrying (`idCol`, `tsCol`: event-time
    * timestamp, `textCol`) against the index. Emits one row per verified
    * pair: (`idCol`, ts, `dup_of`, `jaccard` >= `threshold`), append
    * mode. Re-deliveries of the same (doc, match) pair within `horizon`
    * are suppressed by the watermarked dedup state. */
  def matchedStream(
      docs: DataFrame,
      index: NearDupIndex,
      threshold: Double = 0.5,
      horizon: String = "1 hour",
      idCol: String = "doc_id",
      tsCol: String = "ingest_ts",
      textCol: String = "text"): DataFrame = {
    val withBands = docs
      .withWatermark(tsCol, horizon)
      .withColumn("hs", rowShingleSet(col(textCol)))
      .filter(size(col("hs")) > 0)
      .select(col(idCol), col(tsCol), col("hs"), explode(rowBandKeys(col("hs"))).as("bb"))
      .select(col(idCol), col(tsCol), col("hs"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    withBands
      .join(index.bands.select(col("band"), col("bkey"), col("doc_id").as("dup_of")),
        Seq("band", "bkey"))
      .select(col(idCol), col(tsCol), col("hs"), col("dup_of"))
      // candidate distinct, stream edition: bounded, watermark-evicted
      .dropDuplicatesWithinWatermark(idCol, "dup_of")
      .join(index.hsets.select(col("doc_id").as("dup_of"), col("hs").as("hb")),
        Seq("dup_of"))
      .select(col(idCol), col(tsCol), col("dup_of"),
        size(array_intersect(col("hs"), col("hb"))).as("inter"),
        size(col("hs")).as("na"), size(col("hb")).as("nb"))
      .select(col(idCol), col(tsCol), col("dup_of"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
