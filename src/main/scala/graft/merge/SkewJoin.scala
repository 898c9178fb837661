package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join split cannot help (e.g. the skew is in a single key of a
  * shuffle join whose partitions AQE cannot subdivide further, or the
  * join is feeding a stateful op that pins partitioning).
  *
  * Mechanics: the BIG side's rows are spread across `saltFactor`
  * sub-keys by a deterministic hash of the whole row, so one hot key
  * fans out over `saltFactor` reducers; the SMALL side is replicated
  * once per salt (explode of a literal range — size × saltFactor, which
  * is why the small side must be the dimension). Result is exactly the
  * plain equi-join, partitioned `saltFactor`× finer on hot keys.
  *
  * Salting by a hash of the row (not `rand()`) keeps the operator
  * deterministic — replays, retries, and oracle comparisons see the
  * same placement.
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    require(keys.nonEmpty, "salted join needs at least one key")
    val saltCol = "_salt"
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val salted = big.withColumn(saltCol, pmod(hash(bigCols: _*), lit(saltFactor)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
