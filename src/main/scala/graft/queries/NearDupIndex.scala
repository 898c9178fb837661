package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH index over a landed corpus, plus the
  * batch-vs-corpus match core shared by [[DedupQueries.dedupIncremental]]
  * and the streaming face (`graft.streaming.StreamNearDup`).
  *
  * Production shape at 100 TB: the corpus index — capped band keys plus
  * per-doc shingle sets — is built ONCE per corpus version and persisted
  * as parquet; every later increment (a micro-batch, a backfill, a new
  * crawl slice) matches against it without re-shingling or re-banding a
  * single corpus document. The corpus never self-joins; each increment's
  * (small) band-key frame broadcasts into one hash join against the
  * index, so per-increment cost is O(index scan + candidates).
  *
  * All hash recipes are IDENTICAL to [[DedupQueries]] (md5-derived
  * 32-bit shingle hashes, the same `HashParams` permutations, the same
  * band layout), so index-based matches agree bit-for-bit with the
  * one-shot oracle-gated `dedup_incremental` query.
  */
final case class NearDupIndex(bands: DataFrame, hsets: DataFrame) {

  /** Persist to `dir/bands` + `dir/hsets` parquet. At scale the bands
    * frame is ~(k/bandRows) rows/doc of three narrow columns and the
    * hsets frame one row/doc; both partition and scan like any table. */
  def save(dir: String): Unit = {
    bands.write.mode("overwrite").parquet(s"$dir/bands")
    hsets.write.mode("overwrite").parquet(s"$dir/hsets")
  }
}

object NearDupIndex {
  import DedupQueries.{bandKeysOfSig, sigSets, MinhashBucketCap}

  /** Build the index from a corpus frame carrying (`doc_id`, `text`).
    * Band buckets larger than the skew cap are dropped at BUILD time —
    * the cap belongs to the corpus side (where the mass sits), so every
    * later increment inherits it for free. */
  def build(corpus: DataFrame): NearDupIndex = {
    // ONE aggregation (sigSets) yields band keys + shingle sets; the
    // checkpoint holds ~1 row/doc instead of one row per shingle.
    // localCheckpoint (not cache) — fuzzy decontamination builds a fresh
    // index per call, and cached blocks would accumulate across sweeps.
    val perDoc = sigSets(corpus).localCheckpoint(false)
    val bands = bandKeysOfSig(perDoc)
    val oversized = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > MinhashBucketCap)
      .select(col("band"), col("bkey"))
    val capped = bands.join(broadcast(oversized), Seq("band", "bkey"), "left_anti")
    val hsets = perDoc.select(col("doc_id"), col("hs"))
    NearDupIndex(capped, hsets)
  }

  def load(spark: SparkSession, dir: String): NearDupIndex =
    NearDupIndex(
      spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/hsets"))

  /** Verified near-dup pairs of `newDocs` (carrying `doc_id`, `text`)
    * against the index: (`new_id`, `dup_of`, `jaccard`), one row per
    * pair with exact shingle-set Jaccard >= `threshold`.
    *
    * The increment's band keys BROADCAST into the index join (an
    * increment is small relative to the corpus by construction), the
    * candidate distinct is over (new, corpus) id pairs only, and the
    * verify joins touch just the candidate docs' shingle sets. */
  def matchBatch(index: NearDupIndex, newDocs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    // one sigSets agg + per-doc checkpoint (read 2x: band keys + sets)
    val perDoc = sigSets(newDocs).localCheckpoint(false)
    val batchBands = bandKeysOfSig(perDoc)
    val candidates = index.bands
      .join(broadcast(batchBands.select(col("band"), col("bkey"), col("doc_id").as("new_id"))),
        Seq("band", "bkey"))
      .select(col("new_id"), col("doc_id").as("dup_of"))
      .distinct()
    val newHsets = perDoc.select(col("doc_id"), col("hs"))
    candidates
      .join(newHsets.select(col("doc_id").as("new_id"), col("hs").as("ha")), Seq("new_id"))
      .join(index.hsets.select(col("doc_id").as("dup_of"), col("hs").as("hb")), Seq("dup_of"))
      .select(col("new_id"), col("dup_of"),
        size(array_intersect(col("ha"), col("hb"))).as("inter"),
        size(col("ha")).as("na"), size(col("hb")).as("nb"))
      .select(col("new_id"), col("dup_of"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
