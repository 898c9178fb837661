package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.types.{TableDefinition, TidbTypeMapper}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** S1 (live-source flavor): consistent chunked snapshot scan straight
  * from a MySQL-protocol source — the Spark-native equivalent of the
  * reference's Dumpling dump (`pkg/dumpling/dump.go:18-147`).
  *
  *  - chunking: `partitionColumn` on the first integer PK column splits
  *    the scan into `numPartitions` concurrent range queries — what
  *    Dumpling's `Rows=1` + thread pool does by hand
  *    (`pkg/dumpling/dump.go:84-147`);
  *  - consistency: every connection pins the capture TSO via
  *    `sessionInitStatement` (`SET SESSION tidb_snapshot`), the same
  *    session variable Dumpling sets (`pkg/dumpling/dump.go:43-45`), so
  *    all chunks read one snapshot;
  *  - the TSO comes from [[graft.catalog.SourceCatalog.currentTso]] and
  *    is the same value the change stream starts from (M6 handoff).
  *
  * The option map is pure and unit-tested; `read` hands it to Spark's
  * JDBC source (needs a live server + driver jar, neither in this
  * sandbox).
  */
object JdbcSnapshot {

  /** First PK column with an integer Spark type, if any — the only
    * column kind Spark's JDBC range partitioner accepts. */
  def partitionColumn(d: TableDefinition): Option[String] =
    d.columns.find(c => c.isPrimaryKey && (TidbTypeMapper.toSpark(c) match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })).map(_.name)

  def options(
      url: String,
      d: TableDefinition,
      tso: Long,
      numPartitions: Int,
      bounds: Option[(Long, Long)] = None): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> s"`${d.schema}`.`${d.table}`",
      "sessionInitStatement" -> s"SET SESSION tidb_snapshot = $tso",
      "fetchsize" -> "10000")
    (partitionColumn(d), bounds) match {
      case (Some(pk), Some((lo, hi))) => base ++ Map(
        "partitionColumn" -> pk,
        "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString,
        "numPartitions" -> numPartitions.toString)
      // no integer PK or unknown bounds → single-partition scan (the
      // reference falls back to one writer thread the same way)
      case _ => base
    }
  }

  def read(
      spark: SparkSession,
      url: String,
      d: TableDefinition,
      tso: Long,
      numPartitions: Int = 16,
      bounds: Option[(Long, Long)] = None): DataFrame =
    spark.read.format("jdbc").options(options(url, d, tso, numPartitions, bounds)).load()
}
