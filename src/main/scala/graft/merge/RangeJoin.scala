package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the range join Spark lacks as a
  * native operator.
  *
  * A naive `points.join(ranges, pt >= start && pt <= end)` has no equi
  * key, so Catalyst plans a BroadcastNestedLoopJoin: every point is
  * tested against every range — O(N×R), the classic scale trap. Binning
  * restores an equi key: each range is exploded to the fixed-width bins
  * it overlaps, each point hashes to its own bin, the join is a plain
  * hash join on the bin id, and the exact bounds run as a residual
  * filter AFTER the hash match. Cost: O(R × bins-per-range) build rows
  * and one shuffle keyed on bin — linear, skew-bounded by how many
  * ranges overlap one bin.
  *
  * `binWidth` is the tuning knob: ~the typical interval length. Too
  * small explodes long ranges into many bins; too large degrades the
  * hash join toward all-pairs within a bin. A point matches a range in
  * exactly one bin (its own), so no post-join dedup is needed.
  */
object RangeJoin {

  /** Inner-join `points` to every range whose `[startCol, endCol]`
    * (inclusive, long-typed — e.g. epoch ns/micros) contains `ptCol`.
    * Column names of the two frames must be disjoint. */
  def pointInInterval(
      points: DataFrame,
      ranges: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // integral `div`, NOT `/`: float division of epoch-ns longs
    // (~1.7e18) exceeds double's 2^53 mantissa and corrupts bin ids
    def binOf(c: String) = expr(s"`$c` div ${binWidth}L")
    // explode_outer per the repo-wide lesson: plain explode's inferred
    // non-empty filter would re-derive the sequence in a pushed filter
    val binned = ranges
      .withColumn("_bin", explode_outer(sequence(binOf(startCol), binOf(endCol))))
      .filter(col("_bin").isNotNull)
    points
      .withColumn("_bin", binOf(ptCol))
      .join(binned, Seq("_bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }
}
