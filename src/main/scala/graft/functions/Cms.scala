package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-Min sketch hashing shared by the batch query and the streaming
  * window sketch, so both build the IDENTICAL d×w counter table over the
  * same rows (and DuckDB reproduces it from the same md5 construction). */
object Cms {
  val DefaultDepth = 4
  val DefaultWidth = 256L

  /** Row `j`'s bucket for key `u`: md5("j:u") prefix mod width. */
  def bucket(j: Column, u: Column, width: Long = DefaultWidth): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), u.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(width))

  /** `(j, key)` pairs for all d rows — explode once, hash per row. */
  def rows(key: Column, depth: Int = DefaultDepth): Column =
    explode(sequence(lit(0), lit(depth - 1)))

  /** Point estimates for `probes` (one `key` column) against a sketch of
    * `(j, b, c)` rows (plus any grouping columns such as `win_start`,
    * passed through): min over the key's d cells, absent cells read
    * as 0 — est ≥ true by construction. The sketch is ≤ d×w rows per
    * group and the probe side is the small one, so both joins stay
    * broadcasts at any stream volume. */
  def estimate(
      sketch: org.apache.spark.sql.DataFrame,
      probes: org.apache.spark.sql.DataFrame,
      keyCol: String,
      depth: Int = DefaultDepth,
      width: Long = DefaultWidth): org.apache.spark.sql.DataFrame = {
    val groupCols = sketch.columns.filterNot(Set("j", "b", "c")).toSeq
    // every probe × every sketch group (e.g. window), so a key with NO
    // cells in a group still reports est 0 there
    val groups =
      if (groupCols.isEmpty) probes.sparkSession.range(1).drop("id")
      else sketch.select(groupCols.map(col): _*).distinct()
    val pb = probes
      .select(col(keyCol), rows(col(keyCol), depth).as("j"))
      .select(col(keyCol), col("j"), bucket(col("j"), col(keyCol), width).as("b"))
      .crossJoin(broadcast(groups))
    val joined = pb.join(broadcast(sketch), groupCols ++ Seq("j", "b"), "left")
    val keys = (groupCols :+ keyCol).map(col)
    joined
      .groupBy(keys: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
  }
}
