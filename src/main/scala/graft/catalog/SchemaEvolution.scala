package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.types.{TableDefinition, TidbTypeMapper}

/** Applies a schema-evolution step to a materialized DataFrame — the D2
  * "column-diff → ALTER plan" operator family executed in-engine instead
  * of as warehouse ALTER statements.
  *
  * ADD/DROP/RENAME are metadata-cheap; MODIFY is a full-column cast
  * rewrite (the cost the reference punts to warehouses that support it,
  * SURVEY §7.4(3)). At scale this folds into the next merge's rewrite of
  * the same partitions, so it adds no extra pass.
  */
object SchemaEvolution {

  /** TiDB DDL action codes as carried in schema.json `Type` (public
    * pingcap/tidb parser model enum; dispatch mirrors the reference's
    * `GenDDLViaColumnsDiff` special cases, `pkg/snowsql/ddl.go:41-60` and
    * `replicate/increment.go:283-329`). */
  object Action {
    val CreateSchema = 1
    val DropSchema = 2
    val CreateTable = 3
    val DropTable = 4
    val TruncateTable = 11
    val RenameTable = 14
    val RenameTables = 47
  }

  sealed trait DdlKind
  /** Data wiped, schema kept (TRUNCATE) or table gone (DROP *) — either
    * way the in-engine target empties; a DROP additionally ends the
    * table's story until a new replication task seeds it. */
  case object Wipe extends DdlKind
  case object ColumnDdl extends DdlKind
  final case class Rejected(reason: String) extends DdlKind

  /** Classify a DDL event like the reference's passthrough dispatch:
    * TRUNCATE/DROP TABLE/DROP SCHEMA pass through; CREATE TABLE,
    * CREATE SCHEMA and RENAME TABLE are rejected with the reference's
    * rationale (`pkg/snowsql/ddl.go:41-60`); everything else is a
    * column-level diff. */
  def classify(d: TableDefinition): DdlKind = d.tpe match {
    case Action.TruncateTable | Action.DropTable | Action.DropSchema => Wipe
    case Action.CreateTable =>
      Rejected("received CREATE TABLE ddl, which should not happen mid-stream")
    case Action.CreateSchema =>
      Rejected("received CREATE SCHEMA ddl, which should not happen mid-stream")
    case Action.RenameTable | Action.RenameTables =>
      Rejected("received RENAME TABLE ddl; change data can no longer be captured — " +
        "start a new replication task for the new table name")
    case _ => ColumnDdl
  }

  /** Apply one DDL step: passthrough events first, else column diff. */
  def applyDdl(df: DataFrame, prev: TableDefinition, curr: TableDefinition): DataFrame =
    classify(curr) match {
      case Wipe =>
        // truncate keeps the (possibly evolved) column set of `curr`
        evolve(df, prev, curr).limit(0)
      case Rejected(reason) => sys.error(reason)
      case ColumnDdl => evolve(df, prev, curr)
    }

  /** Evolve `df` (materialized as `prev`) to match `curr`. */
  def evolve(df: DataFrame, prev: TableDefinition, curr: TableDefinition): DataFrame = {
    var out = df
    val diffs = ColumnDiff.diff(prev.columns, curr.columns)
    diffs.foreach {
      case ColumnDiff.Diff(ColumnDiff.Rename, Some(p), Some(c)) =>
        out = out.withColumnRenamed(p.name, c.name)
      case ColumnDiff.Diff(ColumnDiff.Modify, Some(p), Some(c)) =>
        out = out.withColumn(c.name, col(p.name).cast(TidbTypeMapper.toSpark(c)))
      case ColumnDiff.Diff(ColumnDiff.Add, None, Some(c)) =>
        val default = c.default
          .map(v => lit(v).cast(TidbTypeMapper.toSpark(c)))
          .getOrElse(lit(null).cast(TidbTypeMapper.toSpark(c)))
        out = out.withColumn(c.name, default)
      case ColumnDiff.Diff(ColumnDiff.Drop, Some(p), None) =>
        out = out.drop(p.name)
      case _ => // Unchange
    }
    // project to the current column order
    out.select(curr.columns.map(c => col(c.name)): _*)
  }

  /** Fold a chain of definitions oldest→newest over the DataFrame,
    * dispatching each step through the passthrough classifier. */
  def evolveChain(df: DataFrame, chain: Seq[TableDefinition]): DataFrame =
    chain.sliding(2).foldLeft(df) {
      case (acc, Seq(a, b)) => applyDdl(acc, a, b)
      case (acc, _) => acc
    }
}
