package graft.dialects

import graft.types.{TableCol, TableDefinition}
import graft.catalog.ColumnDiff

/** Warehouse SQL dialect family — the reference's four per-warehouse SQL
  * generators re-expressed as pure spec builders
  * (`pkg/{snowsql,bigquerysql,redshiftsql,databrickssql}/{types,ddl,sql}.go`).
  *
  * The Spark engine executes snapshots/merges itself (`merge.ChangeApply`,
  * `snapshot.TargetTable`), so these builders exist for the OTHER half of
  * the reference's surface: a user pointing the pipeline at a real
  * warehouse needs the exact DDL/MERGE text the reference would emit.
  * Everything here is string generation — no connections, unit-tested
  * field-for-field against the reference's shapes.
  */
trait WarehouseDialect {

  /** Dialect key as the reference's CLI names it (`main.go:37-47`). */
  def name: String

  /** Binary column encoding in exported CSV — hex except BigQuery's
    * base64 (`cmd/core.go:59-73`). Feeds `SnapshotLoader`'s export. */
  def binaryDialect: String = "hex"

  /** Rendered type with size suffix where the dialect sizes it,
    * e.g. `VARCHAR(255)`, `NUMBER(10, 2)`. Throws on types the
    * warehouse cannot hold (mirrors the reference's errors). */
  def typeString(c: TableCol): String

  /** Full column clause, e.g. `id INT NOT NULL DEFAULT 0`. */
  def columnString(c: TableCol): String

  /** CREATE TABLE from a definition (D1). */
  def createTableSql(d: TableDefinition): String

  /** Column-diff → ALTER statements (D2). Table-level DDL (TRUNCATE /
    * DROP) passes through; CREATE/RENAME are rejected like the
    * reference's `GenDDLViaColumnsDiff` (`pkg/snowsql/ddl.go:41-60`). */
  def alterSql(prevColumns: Seq[TableCol], curr: TableDefinition): Seq[String]

  /** Per-batch change-apply statements (J1/J2): one MERGE for
    * Snowflake/BigQuery/Databricks, DELETE+INSERT for Redshift. */
  def mergeSql(d: TableDefinition, staging: StagingRef): Seq[String]

  // ---- shared rendering helpers ----

  /** Default literal: unquoted if numeric, else single-quoted —
    * `pkg/snowsql/sql.go:70-76` / `pkg/redshiftsql/ddl.go:72-78`.
    * Unlike the reference (its `// FIXME: escape`) we escape quotes. */
  protected def defaultString(v: String): String =
    if (v.toDoubleOption.isDefined) v else s"'${v.replace("'", "''")}'"

  /** Merge-identity columns: the PK set (the reference omits the ON
    * clause entirely for PK-less tables; we follow `mergeKeys`). */
  protected def pkOf(d: TableDefinition): Seq[String] = d.mergeKeys

  protected def joinIndent(rows: Seq[String]): String =
    rows.map("    " + _).mkString(",\n")

  /** Shared column-diff walk: classify, render per action via the
    * dialect hooks, skip UNCHANGE, `;`-terminate. */
  protected def alterFromDiff(
      tableRef: String,
      prevColumns: Seq[TableCol],
      curr: TableDefinition): Seq[String] =
    ColumnDiff.diff(prevColumns, curr.columns).flatMap {
      case ColumnDiff.Diff(ColumnDiff.Add, _, Some(c)) => addColumnSql(tableRef, c)
      case ColumnDiff.Diff(ColumnDiff.Drop, Some(p), _) => dropColumnSql(tableRef, p)
      case ColumnDiff.Diff(ColumnDiff.Modify, Some(p), Some(c)) => modifyColumnSql(tableRef, p, c)
      case ColumnDiff.Diff(ColumnDiff.Rename, Some(p), Some(c)) => renameColumnSql(tableRef, p, c)
      case _ => Nil // Unchange
    }

  protected def renameColumnSql(tableRef: String, p: TableCol, c: TableCol): Seq[String] =
    Seq(s"ALTER TABLE $tableRef RENAME COLUMN ${p.name} TO ${c.name};")

  protected def addColumnSql(tableRef: String, c: TableCol): Seq[String] =
    Seq(s"ALTER TABLE $tableRef ADD COLUMN ${columnString(c)};")

  protected def dropColumnSql(tableRef: String, p: TableCol): Seq[String] =
    Seq(s"ALTER TABLE $tableRef DROP COLUMN ${p.name};")

  protected def modifyColumnSql(tableRef: String, p: TableCol, c: TableCol): Seq[String]
}

/** Where a batch's change rows live; each dialect reads the fields it
  * needs: Snowflake `stageName`+`filePath`
  * (`pkg/snowsql/sql.go:115-177`), BigQuery `dataset`+`stagingTable`
  * (`pkg/bigquerysql/sql.go:13-70`), Redshift/Databricks `stagingTable`
  * (temp / external table, `pkg/redshiftsql/sql.go:130-196`,
  * `pkg/databrickssql/sql.go:16-73`). */
final case class StagingRef(
    stageName: String = "",
    filePath: String = "",
    dataset: String = "",
    stagingTable: String = "")

object Dialects {

  /** The four change-event metadata columns prepended to a staging
    * table's schema (`pkg/utils/incr_table.go:12-31`). */
  def incrementTableColumns(columns: Seq[TableCol]): Seq[TableCol] =
    Seq(
      TableCol(id = "", name = graft.cdc.Envelope.FlagCol, tp = "varchar", precision = "10"),
      TableCol(id = "", name = graft.cdc.Envelope.TableCol_, tp = "varchar", precision = "255"),
      TableCol(id = "", name = graft.cdc.Envelope.SchemaCol, tp = "varchar", precision = "255"),
      TableCol(id = "", name = graft.cdc.Envelope.CommitTsCol, tp = "bigint")
    ) ++ columns

  val all: Seq[WarehouseDialect] =
    Seq(SnowflakeDialect, BigQueryDialect, RedshiftDialect, DatabricksDialect)

  def forName(n: String): WarehouseDialect =
    all.find(_.name == n.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown warehouse dialect '$n' (expected one of ${all.map(_.name).mkString(", ")})"))

  /** `--csv-output-dialect` → binary encoding for export-only runs
    * (`cmd/core.go:59-73`: bigquery → base64, everything else hex). */
  def csvOutputBinaryDialect(n: String): String = n.toLowerCase match {
    case "bigquery" => "base64"
    case _ => "hex"
  }
}
