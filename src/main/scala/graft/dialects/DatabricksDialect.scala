package graft.dialects

import graft.types.{TableCol, TableDefinition}
import graft.catalog.SchemaEvolution.Action

/** Databricks SQL generation (`pkg/databrickssql/{types,ddl,sql}.go`).
  *
  * Distinctive traits: every text AND blob type collapses to STRING
  * because CSV external tables cannot carry BINARY (`types.go:13-14`),
  * Delta columns take no DEFAULT (`ddl.go:85-86`), the change batch is
  * an external CSV table merged with the same `EXCEPT(row_num)` shape
  * as BigQuery but bare-backtick table refs (`sql.go:16-73`), and CSV
  * loads cast Spark's positional `_c{i}` headers back to typed named
  * columns (`sql.go:184-195`). */
object DatabricksDialect extends WarehouseDialect {

  val name = "databricks"

  /** TiDB→Databricks type map (`pkg/databrickssql/types.go:15-41`). */
  private val typeMap: Map[String, String] = Map(
    "text" -> "STRING", "tinytext" -> "STRING", "mediumtext" -> "STRING",
    "longtext" -> "STRING",
    "blob" -> "STRING", "tinyblob" -> "STRING", "mediumblob" -> "STRING",
    "longblob" -> "STRING",
    "varchar" -> "STRING", "char" -> "STRING",
    "int" -> "INT", "mediumint" -> "INT", "tinyint" -> "TINYINT",
    "smallint" -> "SMALLINT", "bigint" -> "BIGINT",
    "float" -> "FLOAT", "double" -> "DOUBLE",
    "decimal" -> "DECIMAL", "numeric" -> "NUMERIC",
    "bool" -> "BOOLEAN", "boolean" -> "BOOLEAN",
    "date" -> "DATE", "datetime" -> "TIMESTAMP_NTZ",
    "timestamp" -> "TIMESTAMP", "time" -> "TIMESTAMP_NTZ")

  /** `pkg/databrickssql/types.go:43-55` — only decimals are sized. */
  def typeString(c: TableCol): String = {
    val tp = c.tp.toLowerCase
    tp match {
      case "decimal" | "numeric" => s"${typeMap(tp)}(${c.precision}, ${c.scale})"
      case _ =>
        typeMap.getOrElse(tp,
          throw new IllegalArgumentException(s"Unsupported data type: ${c.tp}"))
    }
  }

  /** `pkg/databrickssql/ddl.go:70-88` — Delta supports no column
    * defaults, so only NOT NULL is rendered. */
  def columnString(c: TableCol): String = {
    val sb = new StringBuilder(s"${c.name} ${typeString(c)}")
    if (c.nullable == "false") sb.append(" NOT NULL")
    sb.toString
  }

  /** `pkg/databrickssql/sql.go:80-104` GenCreateTableSQL — no PK clause
    * (Delta has none to declare). */
  def createTableSql(d: TableDefinition): String =
    s"CREATE TABLE ${d.table} (\n${joinIndent(d.columns.map(columnString))}\n)"

  /** `pkg/databrickssql/sql.go:106-128` GenCreateExternalTableSQL. */
  def createExternalTableSql(tableName: String, columns: Seq[TableCol], storageUri: String): String =
    s"""CREATE EXTERNAL TABLE $tableName (
${joinIndent(columns.map(columnString))}
) USING CSV
LOCATION '$storageUri'"""

  /** `pkg/databrickssql/sql.go:184-195` buildColumnCastAndRename:
    * headerless CSV comes in as `_c0.._cN`; cast each back to the typed
    * name. This is the same projection `Envelope.project` runs inside
    * the engine. */
  def castAndRenameProjection(columns: Seq[TableCol]): String =
    columns.zipWithIndex
      .map { case (c, i) => s"cast(_c$i as ${typeString(c)}) as ${c.name}" }
      .mkString(", ")

  /** `pkg/databrickssql/sql.go:130-160` LoadCSVFromS3. */
  def copyIntoSql(targetTable: String, columns: Seq[TableCol], storageUri: String, filePath: String): String =
    s"""COPY INTO $targetTable
FROM (
    SELECT ${castAndRenameProjection(columns)}
    FROM '$storageUri/$filePath'
)
FILEFORMAT = CSV
FORMAT_OPTIONS ('delimiter' = ',', 'inferSchema' = 'true')
COPY_OPTIONS ('mergeSchema' = 'true');"""

  /** `pkg/databrickssql/ddl.go:12-68` GenDDLViaColumnsDiff. */
  def alterSql(prevColumns: Seq[TableCol], curr: TableDefinition): Seq[String] =
    curr.tpe match {
      case Action.TruncateTable => Seq(s"TRUNCATE TABLE ${curr.table}")
      case Action.DropTable => Seq(s"DROP TABLE ${curr.table}")
      case Action.DropSchema => Seq(s"DROP SCHEMA ${curr.schema} CASCADE")
      case Action.CreateTable | Action.CreateSchema =>
        throw new IllegalArgumentException("Received create table ddl, which should not happen")
      case Action.RenameTable | Action.RenameTables =>
        throw new IllegalArgumentException(
          "Received rename table ddl, new change data can not be captured by TiCDC any more. " +
            "If you want to rename table, please start a new task to capture the new table")
      case _ => alterFromDiff(curr.table, prevColumns, curr)
    }

  /** In-place type modify is unsupported (`ddl.go:52-54`). */
  protected def modifyColumnSql(tableRef: String, p: TableCol, c: TableCol): Seq[String] =
    throw new IllegalArgumentException(
      "Received modify column ddl, which is not supported by Databricks yet")

  /** `pkg/databrickssql/sql.go:16-73` GenMergeIntoSQL — BigQuery's shape
    * with backticked bare table names and unquoted column refs. */
  def mergeSql(d: TableDefinition, staging: StagingRef): Seq[String] = {
    val flag = graft.cdc.Envelope.FlagCol
    val commitTs = graft.cdc.Envelope.CommitTsCol
    val pk = pkOf(d)
    val onStat = pk.map(k => s"T.$k = S.$k").mkString(" AND ")
    val updateStat = d.columns.map(c => s"${c.name} = S.${c.name}").mkString(", ")
    val insertStat = d.columns.map(_.name).mkString(", ")
    val valuesStat = d.columns.map(c => s"S.${c.name}").mkString(", ")
    Seq(s"""MERGE INTO `${d.table}` AS T USING
(
    SELECT * EXCEPT(row_num)
    FROM (
        SELECT
            *, row_number() over (partition by ${pk.mkString(", ")} order by $commitTs desc) as row_num
        FROM `${staging.stagingTable}`
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

  def dropTableIfExistsSql(tableName: String): String = s"DROP TABLE IF EXISTS $tableName"
}
