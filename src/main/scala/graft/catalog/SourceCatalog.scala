package graft.catalog

import java.sql.{Connection, DriverManager}

import graft.types.{TableCol, TableDefinition}

/** Source-database catalog + TSO capture (SURVEY §2.1 S2/S3/S4, §2.6 O3).
  *
  * Bootstraps a `TableDefinition` from a live MySQL-protocol source the
  * way the reference does: column metadata from
  * `information_schema.columns` (`pkg/tidbsql/ddl.go:115-196`), PK
  * columns from `SHOW INDEX` ordered by index sequence
  * (`pkg/tidbsql/ddl.go:199-222`), and the snapshot TSO from
  * `SELECT @@tidb_current_ts` (`pkg/tidbsql/tso.go:9-23`).
  *
  * The SQL text and the row→TableCol assembly are the logic worth
  * testing, so they are written against a one-method [[SqlExecutor]];
  * [[JdbcExecutor]] is the thin `java.sql` adapter for a real
  * connection. In this sandbox there is no live TiDB, so tests drive the
  * assembly through a fixture executor returning canned catalog rows.
  */
object SourceCatalog {

  /** One catalog result row: column label → value (None = SQL NULL). */
  type Row = Map[String, Option[String]]

  trait SqlExecutor {
    def query(sql: String): Seq[Row]
  }

  def columnsQuery(schema: String, table: String): String =
    s"""SELECT COLUMN_NAME, COLUMN_DEFAULT, IS_NULLABLE, DATA_TYPE,
       |CHARACTER_MAXIMUM_LENGTH, NUMERIC_PRECISION, NUMERIC_SCALE, DATETIME_PRECISION,
       |COLUMN_TYPE, EXTRA, ORDINAL_POSITION
       |FROM information_schema.columns
       |WHERE table_schema = '${escapeSqlString(schema)}' AND table_name = '${escapeSqlString(table)}'
       |ORDER BY ORDINAL_POSITION""".stripMargin

  def pkQuery(schema: String, table: String): String =
    s"SHOW INDEX FROM `${escapeIdent(schema)}`.`${escapeIdent(table)}`"

  val tsoQuery: String = "SELECT @@tidb_current_ts"

  /** S3: typed column metadata in ordinal order. Follows the reference's
    * assembly: precision prefers numeric > datetime > char length,
    * nullable from IS_NULLABLE, `COLUMN_TYPE`'s " unsigned" suffix kept
    * on the type name, and VIRTUAL GENERATED columns skipped (they never
    * appear in CDC row images). Unlike the reference we also escape the
    * identifier into the WHERE clause (its `// FIXME: Escape`). */
  def columns(exec: SqlExecutor, schema: String, table: String): Seq[TableCol] =
    exec.query(columnsQuery(schema, table))
      .filterNot(_.getOrElse("EXTRA", None).exists(_.contains("VIRTUAL GENERATED")))
      .map { r =>
        def get(k: String): Option[String] = r.getOrElse(k, None)
        val dataType = get("DATA_TYPE").getOrElse("")
        val colType = get("COLUMN_TYPE").getOrElse("")
        val tp =
          if (colType.contains("unsigned") && !dataType.endsWith(" unsigned")) s"$dataType unsigned"
          else dataType
        TableCol(
          id = get("ORDINAL_POSITION").getOrElse(""),
          name = get("COLUMN_NAME").getOrElse(""),
          tp = tp,
          precision = get("NUMERIC_PRECISION")
            .orElse(get("DATETIME_PRECISION"))
            .orElse(get("CHARACTER_MAXIMUM_LENGTH"))
            .getOrElse(""),
          scale = get("NUMERIC_SCALE").getOrElse(""),
          nullable = if (get("IS_NULLABLE").contains("YES")) "true" else "false",
          default = get("COLUMN_DEFAULT"))
      }

  /** S4/O3: PRIMARY-key column names in index-sequence order. The
    * reference sorts SEQ_IN_INDEX lexicographically (`ddl.go:209-214`),
    * which misorders a >9-column PK ("10" < "2"); we sort numerically. */
  def primaryKey(exec: SqlExecutor, schema: String, table: String): Seq[String] =
    exec.query(pkQuery(schema, table))
      .filter(_.getOrElse("KEY_NAME", None).contains("PRIMARY"))
      .sortBy(_.getOrElse("SEQ_IN_INDEX", None).flatMap(_.toIntOption).getOrElse(0))
      .flatMap(_.getOrElse("COLUMN_NAME", None))

  /** S2: the replication start point. */
  def currentTso(exec: SqlExecutor): Long =
    exec.query(tsoQuery).headOption
      .flatMap(_.values.flatten.headOption)
      .flatMap(_.toLongOption)
      .getOrElse(sys.error(s"'$tsoQuery' returned no TSO"))

  /** D4 seed: assemble the catalog into the snapshot-time definition.
    * `tableVersion` defaults to the capture TSO so schema history stays
    * totally ordered with the CDC stream's versions. Tables without a
    * PRIMARY KEY keep `pkColumns` empty — like the reference, which
    * omits the PK clause (`pkg/snowsql/sql.go:99-101`); downstream the
    * merge key then falls back to the full row image. */
  def tableDefinition(
      exec: SqlExecutor,
      schema: String,
      table: String,
      tableVersion: Option[Long] = None): TableDefinition = {
    val pk = primaryKey(exec, schema, table).toSet
    val cols = columns(exec, schema, table)
      .map(c => if (pk.contains(c.name)) c.copy(isPk = "true", nullable = "false") else c)
    require(cols.nonEmpty, s"table $schema.$table not found in information_schema")
    TableDefinition(
      schema = schema,
      table = table,
      tableVersion = tableVersion.getOrElse(currentTso(exec)),
      columns = cols)
  }

  private def escapeSqlString(s: String): String = s.replace("\\", "\\\\").replace("'", "''")
  private def escapeIdent(s: String): String = s.replace("`", "``")
}

/** `java.sql` adapter for [[SourceCatalog.SqlExecutor]] — the only part
  * that needs a live server, kept to a thin row-materializing shim. */
final class JdbcExecutor(conn: Connection) extends SourceCatalog.SqlExecutor {
  def query(sql: String): Seq[SourceCatalog.Row] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      try {
        val md = rs.getMetaData
        val labels = (1 to md.getColumnCount).map(md.getColumnLabel)
        val out = Seq.newBuilder[SourceCatalog.Row]
        while (rs.next())
          out += labels.map(l => l -> Option(rs.getString(l))).toMap
        out.result()
      } finally rs.close()
    } finally st.close()
  }
}

object JdbcExecutor {
  def connect(url: String, user: String, password: String): JdbcExecutor =
    new JdbcExecutor(DriverManager.getConnection(url, user, password))
}
