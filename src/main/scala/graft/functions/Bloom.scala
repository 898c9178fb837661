package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter for large-scale membership pre-filtering
  * (the 100 TB anti-join pattern: a blocklist too big to broadcast as a
  * set still broadcasts as FIXED-SIZE bits, and the exact verify join
  * then carries only bloom-positive rows through the exchange).
  *
  * Probe positions derive from ONE 64-bit input hash via rotate/xor
  * mixing only — no add/multiply, so the arithmetic is identical (and
  * overflow-free under ANSI mode) between the Scala aggregator that
  * BUILDS the bits and the Column expression that TESTS them
  * ([[Bloom.mayContain]]); `BloomSpec` pins build/test parity bit for
  * bit. Partial buffers merge by bitwise OR (associative, commutative),
  * so the build is one map-side-combinable aggregation whose exchange
  * carries `partitions × m/64` longs no matter how many keys flow in.
  *
  * No false negatives by construction; false positives are removed by
  * the exact verify join, so operators built on this are EXACT — the
  * bloom only decides which rows pay the join.
  */
object Bloom {

  /** Default sizing: 2^17 bits = 16 KiB — always broadcastable; with
    * k=5 probes the false-positive rate stays < 1 % up to ~9 k keys
    * (size m ∝ blocklist cardinality in production: ~10 bits/key). */
  val DefaultBits: Int = 1 << 17
  val DefaultK: Int = 5

  private def rotl(h: Long, r: Int): Long = (h << r) | (h >>> (64 - r))

  /** Bit index of probe `i` for `hash` — rotate/xor only (see above). */
  def probeIndex(hash: Long, i: Int, mBits: Int): Int = {
    val g = rotl(hash, 7 * i + 13) ^ rotl(hash, 47 - 11 * i) ^ (hash >>> 29)
    (g & (mBits - 1)).toInt
  }

  /** The same probe as a Column over a LongType hash column. */
  private def probeIndexCol(hash: Column, i: Int, mBits: Int): Column = {
    def rotlC(c: Column, r: Int): Column =
      shiftleft(c, r).bitwiseOR(shiftrightunsigned(c, 64 - r))
    val g = rotlC(hash, 7 * i + 13)
      .bitwiseXOR(rotlC(hash, 47 - 11 * i))
      .bitwiseXOR(shiftrightunsigned(hash, 29))
    g.bitwiseAND(lit((mBits - 1).toLong))
  }

  /** Membership test against driver-held filter words (bounded model
    * state — m/64 longs — embedded as a literal, so the test is a pure
    * per-row projection: no join, no shuffle). */
  private val BitMasks: Array[Long] = Array.tabulate(64)(1L << _)

  def mayContain(words: Array[Long], hash: Column, mBits: Int = DefaultBits,
      k: Int = DefaultK): Column =
    mayContainCol(lit(words), hash, mBits, k)

  /** [[mayContain]] with the hash expression evaluated exactly ONCE per
    * row. The plain form references `hash` 2k times (word index + bit
    * mask per probe), and Catalyst's filter pushdown substitutes the
    * FULL upstream expression into every reference — a fingerprint
    * derived through a regex/md5 chain gets re-evaluated ~10× per row
    * (measured 7× slower on the domain-blocklist gate). Routing the
    * hash through a one-element-array lambda makes the probes reference
    * the LAMBDA VARIABLE, which pushdown cannot inline past, so the
    * chain runs once however deep it is. Use this form whenever the
    * hashed expression is more than a column reference. */
  def mayContainOnce(words: Array[Long], hash: Column, mBits: Int = DefaultBits,
      k: Int = DefaultK): Column =
    element_at(transform(array(hash), h => mayContain(words, h, mBits, k)), 1)

  /** Same test with the filter words as a COLUMN — for probing a
    * bounded frame of per-partition filters (one words row per bucket,
    * e.g. [[graft.snapshot.BloomIndex]]) instead of one global literal. */
  def mayContainCol(words: Column, hash: Column, mBits: Int = DefaultBits,
      k: Int = DefaultK): Column =
    (0 until k).map { i =>
      val idx = probeIndexCol(hash, i, mBits)
      val word = element_at(words, shiftrightunsigned(idx, 6).cast("int") + 1)
      val mask = element_at(lit(BitMasks), idx.bitwiseAND(lit(63L)).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)

  /** SQL surface at default sizing: `bloom_agg(hash)` builds the words
    * and `bloom_contains(words, hash)` tests them, so pure-SQL sessions
    * can run the blocklist pattern —
    * `WHERE NOT bloom_contains((SELECT bloom_agg(h) FROM block), xxhash64(fp))`.
    * Same probe arithmetic as [[probeIndex]], so a SQL-built filter and
    * a DataFrame-built one are interchangeable. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("bloom_agg", udaf(new BloomAgg()))
    spark.udf.register("bloom_contains", (words: Seq[Long], h: Long) => {
      var i = 0
      var ok = true
      while (ok && i < DefaultK) {
        val idx = probeIndex(h, i, DefaultBits)
        ok = (words(idx >>> 6) & (1L << (idx & 63))) != 0L
        i += 1
      }
      ok
    })
  }
}

/** Build the filter over a LongType hash column: state = m/64 longs,
  * merge = bitwise OR. */
class BloomAgg(mBits: Int = Bloom.DefaultBits, k: Int = Bloom.DefaultK)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(buf: Array[Long], in: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val idx = Bloom.probeIndex(in, i, mBits)
      buf(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
