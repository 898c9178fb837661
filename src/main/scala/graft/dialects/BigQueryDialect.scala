package graft.dialects

import graft.types.{TableCol, TableDefinition}
import graft.catalog.SchemaEvolution.Action

/** BigQuery SQL generation (`pkg/bigquerysql/{types,ddl,sql}.go`).
  *
  * Distinctive traits: the only dialect with `json`/`set`/`bit`/`year`
  * mappings and no size suffixes (`types.go:12-46`), base64 binary CSV
  * (`cmd/core.go:70-71`), merge from a staging table with the named
  * `tidb2dw_*` metadata columns and a `SELECT * EXCEPT(row_num)`
  * latest-per-key subquery (`sql.go:13-70`), backticked identifiers,
  * `dataset.table` qualified names.
  */
object BigQueryDialect extends WarehouseDialect {

  val name = "bigquery"

  override val binaryDialect = "base64"

  /** TiDB→BigQuery type map (`pkg/bigquerysql/types.go:12-46`). */
  private val typeMap: Map[String, String] = Map(
    "bigint" -> "INT64", "bigint unsigned" -> "NUMERIC",
    "binary" -> "BYTES", "bit" -> "BOOL", "blob" -> "BYTES",
    "char" -> "STRING", "date" -> "DATE", "datetime" -> "DATETIME",
    "decimal" -> "NUMERIC", "double" -> "FLOAT64", "float" -> "FLOAT64",
    "int" -> "INT64", "int unsigned" -> "INT64", "json" -> "STRING",
    "longblob" -> "BYTES", "longtext" -> "STRING",
    "mediumblob" -> "BYTES", "mediumint" -> "INT64",
    "mediumint unsigned" -> "INT64", "mediumtext" -> "STRING",
    "set" -> "STRING", "smallint" -> "INT64", "smallint unsigned" -> "INT64",
    "text" -> "STRING", "time" -> "TIME", "timestamp" -> "TIMESTAMP",
    "tinyblob" -> "BYTES", "tinyint" -> "INT64", "tinyint unsigned" -> "INT64",
    "tinytext" -> "STRING", "varbinary" -> "BYTES", "varchar" -> "STRING",
    "year" -> "INT64")

  /** No size suffixes — BigQuery types are unparameterized here
    * (`types.go:48-55`). */
  def typeString(c: TableCol): String =
    typeMap.getOrElse(c.tp.toLowerCase,
      throw new IllegalArgumentException(s"Unsupported TiDB type ${c.tp}"))

  /** `pkg/bigquerysql/ddl.go:104-126` GetBigQueryColumnString with
    * createTable=false (ALTER context: no DEFAULT NULL clause). */
  def columnString(c: TableCol): String = columnString(c, createTable = false)

  /** createTable=true additionally renders `DEFAULT NULL` on nullable
    * columns; DEFAULT must precede NOT NULL (`ddl.go:115-123`). */
  def columnString(c: TableCol, createTable: Boolean): String = {
    val sb = new StringBuilder(s"`${c.name}` ${typeString(c)}")
    if (createTable && c.nullable == "true") sb.append(" DEFAULT NULL")
    if (c.nullable == "false") sb.append(" NOT NULL")
    sb.toString
  }

  /** `pkg/bigquerysql/sql.go:73-99` GenCreateSchema — dataset-qualified,
    * PRIMARY KEY ... NOT ENFORCED. */
  def createTableSql(d: TableDefinition): String = createTableSql(d, d.schema)

  def createTableSql(d: TableDefinition, datasetId: String): String = {
    val rows = d.columns.map(columnString(_, createTable = true)) ++
      (if (d.pkColumns.nonEmpty)
         Seq(s"PRIMARY KEY (`${d.pkColumns.mkString(", ")}`) NOT ENFORCED")
       else Nil)
    s"CREATE OR REPLACE TABLE $datasetId.${d.table} (\n${joinIndent(rows)}\n)"
  }

  /** `pkg/bigquerysql/ddl.go:36-102` GenDDLViaColumnsDiff: backticked
    * `dataset.table` for ADD/DROP/MODIFY, unquoted for RENAME and
    * TRUNCATE-less passthroughs; schema-level DDL unsupported. */
  def alterSql(prevColumns: Seq[TableCol], curr: TableDefinition): Seq[String] = {
    val fullName = s"${curr.schema}.${curr.table}"
    curr.tpe match {
      case Action.TruncateTable => Seq(s"TRUNCATE TABLE `$fullName`")
      case Action.DropTable => Seq(s"DROP TABLE `$fullName`")
      case Action.DropSchema =>
        throw new IllegalArgumentException("Received drop schema ddl, which does not support")
      case Action.CreateTable | Action.CreateSchema =>
        throw new IllegalArgumentException("Received create table ddl, which should not happen")
      case Action.RenameTable | Action.RenameTables =>
        throw new IllegalArgumentException(
          "Received rename table ddl, new change data can not be captured by TiCDC any more. " +
            "If you want to rename table, please start a new task to capture the new table")
      case _ => alterFromDiff(fullName, prevColumns, curr)
    }
  }

  /** ADD COLUMN cannot carry a default (`ddl.go:66-78`): error when the
    * source column has one, and a follow-up `SET DEFAULT NULL` when
    * nullable. */
  override protected def addColumnSql(tableRef: String, c: TableCol): Seq[String] = {
    val add = s"ALTER TABLE `$tableRef` ADD COLUMN ${columnString(c)};"
    if (c.default.isDefined)
      throw new IllegalArgumentException(
        "BigQuery currently does not support add column with default value")
    else if (c.nullable == "true")
      Seq(add, s"ALTER TABLE `$tableRef` ALTER COLUMN `${c.name}` SET DEFAULT NULL;")
    else Seq(add)
  }

  override protected def dropColumnSql(tableRef: String, p: TableCol): Seq[String] =
    Seq(s"ALTER TABLE `$tableRef` DROP COLUMN `${p.name}`;")

  /** `pkg/bigquerysql/ddl.go:16-34` GetColumnModifyString: SET DATA TYPE
    * on type change, DROP NOT NULL when loosening; tightening to
    * required is unsupported (warn-and-skip in the reference). */
  protected def modifyColumnSql(tableRef: String, p: TableCol, c: TableCol): Seq[String] = {
    val clauses = Seq.newBuilder[String]
    if (p.tp != c.tp || p.precision != c.precision || p.scale != c.scale)
      clauses += s"`${c.name}` SET DATA TYPE ${typeString(c)}"
    if (p.nullable != c.nullable && c.nullable == "true")
      clauses += s"`${c.name}` DROP NOT NULL"
    val joined = clauses.result().mkString(", ")
    if (joined.isEmpty) Nil else Seq(s"ALTER TABLE `$tableRef` ALTER COLUMN $joined;")
  }

  /** Reference quirk preserved: RENAME is emitted UNQUOTED
    * (`ddl.go:92-93`). */
  override protected def renameColumnSql(tableRef: String, p: TableCol, c: TableCol): Seq[String] =
    Seq(s"ALTER TABLE $tableRef RENAME COLUMN ${p.name} TO ${c.name};")

  /** `pkg/bigquerysql/sql.go:13-70` GenMergeInto: staging external table
    * with named metadata columns, latest-per-key via
    * `SELECT * EXCEPT(row_num)`. */
  def mergeSql(d: TableDefinition, staging: StagingRef): Seq[String] = {
    val flag = graft.cdc.Envelope.FlagCol
    val commitTs = graft.cdc.Envelope.CommitTsCol
    val pk = pkOf(d)
    val onStat = pk.map(k => s"T.$k = S.$k").mkString(" AND ")
    val updateStat = d.columns.map(c => s"`${c.name}` = S.${c.name}").mkString(", ")
    val insertStat = d.columns.map(c => s"`${c.name}`").mkString(", ")
    val valuesStat = d.columns.map(c => s"S.${c.name}").mkString(", ")
    Seq(s"""MERGE INTO `${staging.dataset}.${d.table}` AS T USING
(
    SELECT * EXCEPT(row_num)
    FROM (
        SELECT
            *, row_number() over (partition by ${pk.mkString(", ")} order by $commitTs desc) as row_num
        FROM `${staging.dataset}.${staging.stagingTable}`
    )
    WHERE row_num = 1
) AS S
ON
(
    $onStat
)
WHEN MATCHED AND S.$flag != 'D' THEN UPDATE SET $updateStat
WHEN MATCHED AND S.$flag = 'D' THEN DELETE
WHEN NOT MATCHED AND S.$flag != 'D' THEN INSERT ($insertStat) VALUES ($valuesStat);""")
  }
}
