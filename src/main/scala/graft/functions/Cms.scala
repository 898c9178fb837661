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
}
