package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded K-minimum-values distinct sketch: keeps the `k` smallest
  * DISTINCT hash values seen, sorted ascending.
  *
  * This is the 100 TB distinct-count tool: state is ≤ k longs per group
  * no matter how many rows flow in, the partial buffers merge
  * associatively (sorted-distinct merge, re-bounded at k), so the
  * exchange carries `partitions × groups × k` longs instead of the
  * distinct value set itself. The estimator on top ((k-1)/h_k over
  * 60-bit-normalized hashes) is deterministic — unlike HLL-based
  * `approx_count_distinct`, two engines hashing with the same md5
  * prefix compute the IDENTICAL estimate, so the result is fully
  * oracle-checkable.
  *
  * Duplicate inputs (same hash) are dropped on insert — the sketch is a
  * distinct set by construction, which is what lets callers feed raw
  * rows without an exact-distinct shuffle first.
  */
object Kmv {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** 2^60 — a 15-hex-char md5 prefix normalizes to (0,1) by this divisor. */
  val Hash60 = 1152921504606846976.0

  /** 60-bit uniform hash of any key column (md5 hex prefix) — the same
    * construction DuckDB reproduces bit-for-bit, and the same hash for
    * the batch and streaming KMV paths so both compute one estimate. */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV sketch array → distinct estimate (exact below capacity k). */
  def estimate(sketch: Column, k: Int): Column =
    round(
      when(size(sketch) < k, size(sketch).cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (element_at(sketch, k).cast("double") / lit(Hash60))),
      6)

  /** Default SQL-surface capacity — σ ≈ 1/√(k−2) ≈ 12.7 %. */
  val DefaultK = 64

  /** SQL surface: `kmv_sketch(hash)` (aggregate, k=64) and
    * `kmv_estimate(sketch, k)` — so pure-SQL sessions can run
    * `SELECT kmv_estimate(kmv_sketch(h), 64) FROM …` with the same
    * bounded state as the DataFrame path. `k` must be the capacity the
    * sketch was BUILT with (64 for `kmv_sketch`): a sketch longer than
    * `k` proves a capacity mismatch and fails loudly instead of
    * silently misestimating. The scalar estimator repeats
    * [[estimate]]'s arithmetic on plain doubles — identical IEEE ops,
    * identical result. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("kmv_sketch", udaf(new KmvAgg(DefaultK)))
    spark.udf.register("kmv_estimate", (sketch: Seq[Long], k: Int) => {
      require(sketch.length <= k,
        s"kmv_estimate: sketch holds ${sketch.length} values > k=$k — " +
          "it was built with a larger capacity; pass the build-time k")
      if (sketch.length < k)
        BigDecimal(sketch.length.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else
        BigDecimal((k - 1).toDouble / (sketch(k - 1).toDouble / Hash60))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    })
  }
}

class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    if (buf.lengthCompare(k) >= 0 && in >= buf.last) buf
    else {
      val (lo, hi) = buf.span(_ < in)
      if (hi.headOption.contains(in)) buf
      else (lo :+ in) ++ hi.take(k - lo.length - 1)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    KmvAgg.mergeSorted(a, b, k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvAgg {
  /** Sorted-distinct merge of two sketches, re-bounded at k — the one
    * operation both the partial-buffer merge and sketch RE-aggregation
    * need (associative, commutative, idempotent). */
  def mergeSorted(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val next =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (out.isEmpty || out.last != next) out += next
    }
    out.toSeq
  }
}

/** Merge PRE-BUILT KMV sketches — the re-aggregability half of the
  * sketch contract: persist per-partition/per-hour/per-source sketches
  * once, then roll them up to any coarser scope WITHOUT re-scanning the
  * rows. Sound because the k smallest distinct hashes of a union are
  * contained in the union of each side's k smallest — merging sketches
  * loses nothing the full rescan would keep. State stays ≤ k longs. */
class KmvMergeAgg(k: Int) extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Nil
  override def reduce(buf: Seq[Long], in: Seq[Long]): Seq[Long] =
    KmvAgg.mergeSorted(buf, in, k)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    KmvAgg.mergeSorted(a, b, k)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
