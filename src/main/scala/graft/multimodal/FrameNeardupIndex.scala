package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable sampled-frame fingerprint index over landed media, plus
  * the increment-vs-corpus match core shared by the one-shot
  * `mm_frame_neardup_incremental` query and the streaming face
  * (`graft.streaming.StreamFrameNeardup`) — the multimodal twin of
  * [[graft.queries.NearDupIndex]].
  *
  * Production shape at 100 TB: the corpus index — one (doc, frame
  * fingerprint) row per SAMPLED frame (≤ ⌈32/stride⌉ per payload, so
  * the index is a bounded multiple of the doc count no matter how big
  * the payloads are) plus the per-doc fingerprint array for exact
  * verification — is built once per corpus version and persisted as
  * parquet. Every later increment (a micro-batch of uploads, a backfill)
  * matches against it without re-decoding a single corpus payload: the
  * increment's (small) fingerprint frame broadcasts into one hash join,
  * so per-increment cost is O(index scan + candidates), never
  * O(corpus²) re-pairing.
  *
  * The fingerprint recipe is IDENTICAL to the oracle-gated
  * `mm_frame_neardup` batch query (seed → content id → md5 per sampled
  * frame index), so index-based matches agree bit-for-bit with the
  * batch self-join — the same fake-codec contract MultimodalSpec pins
  * against [[FakeMediaCodec]]; a real frame decoder slots in behind
  * [[rowFrameFps]] unchanged.
  */
final case class FrameNeardupIndex(frames: DataFrame, fpsets: DataFrame) {

  /** Persist to `dir/frames` + `dir/fpsets` parquet. */
  def save(dir: String): Unit = {
    frames.write.mode("overwrite").parquet(s"$dir/frames")
    fpsets.write.mode("overwrite").parquet(s"$dir/fpsets")
  }
}

object FrameNeardupIndex {

  /** Every `FrameStride`-th frame is fingerprinted — the sampling knob
    * shared with `mm_frame_sample`. */
  val FrameStride = 4

  /** Candidate pairs must share at least this many sampled frames
    * before they count as near-duplicates. */
  val MinShared = 2

  /** Per-row sampled-frame fingerprint ARRAY from a binary payload:
    * seed → content id (seed mod 256 — the fake codec's granularity) →
    * md5 per sampled frame index. Pure projection, zero shuffle; the
    * array is bounded by ⌈32/stride⌉ regardless of payload size. Same
    * derivation as the `mm_frame_neardup` oracle SQL. */
  def rowFrameFps(content: Column): Column = {
    val h = conv(substring(md5(hex(content)), 1, 8), 16, 10).cast("long")
    val cid = pmod(h, lit(256L))
    val n = lit(1L) + shiftright(h, 16).bitwiseAND(lit(31L))
    transform(sequence(lit(0L), n - 1, lit(FrameStride.toLong)),
      i => md5(concat(cid.cast("string"), lit(":"), i.cast("string"))))
  }

  /** Build the index from a media frame carrying (`doc_id`, `content`).
    * The corpus is scanned ONCE (eager localCheckpoint — the exploded
    * probe side and the verification arrays both derive from it, and
    * repeated Verify/Bench runs must not accumulate storage). */
  def build(media: DataFrame): FrameNeardupIndex = {
    val fpsets = media
      .select(col("doc_id"), rowFrameFps(col("content")).as("fps"))
      .localCheckpoint(true)
    val frames = fpsets.select(col("doc_id"), explode(col("fps")).as("frame_fp"))
    FrameNeardupIndex(frames, fpsets)
  }

  def load(spark: SparkSession, dir: String): FrameNeardupIndex =
    FrameNeardupIndex(
      spark.read.parquet(s"$dir/frames"),
      spark.read.parquet(s"$dir/fpsets"))

  /** Near-dup pairs of `newMedia` (carrying `doc_id`, `content`) against
    * the index: (`new_id`, `dup_of`, `n_shared`, `frame_jaccard_e6`),
    * one row per pair sharing ≥ [[MinShared]] sampled frames.
    *
    * The increment's fingerprints BROADCAST into the index join (an
    * increment is small relative to the corpus by construction); the
    * verify step intersects the two bounded per-doc arrays — no second
    * pass over the index. */
  def matchBatch(index: FrameNeardupIndex, newMedia: DataFrame): DataFrame = {
    // read 2x (probe explode + verify join) — same single-scan rationale
    // as build
    val nf = newMedia
      .select(col("doc_id").as("new_id"), rowFrameFps(col("content")).as("fa"))
      .localCheckpoint(true)
    val candidates = index.frames
      .join(broadcast(nf.select(col("new_id"), explode(col("fa")).as("frame_fp"))),
        Seq("frame_fp"))
      .select(col("new_id"), col("doc_id").as("dup_of"))
      .distinct()
    candidates
      .join(nf, Seq("new_id"))
      .join(index.fpsets.select(col("doc_id").as("dup_of"), col("fps").as("fb")),
        Seq("dup_of"))
      .select(col("new_id"), col("dup_of"),
        size(array_intersect(col("fa"), col("fb"))).cast("long").as("n_shared"),
        size(col("fa")).cast("long").as("na"), size(col("fb")).cast("long").as("nb"))
      .filter(col("n_shared") >= MinShared)
      .select(col("new_id"), col("dup_of"), col("n_shared"),
        (col("n_shared") * lit(1000000L) /
          (col("na") + col("nb") - col("n_shared"))).cast("long").as("frame_jaccard_e6"))
  }
}
