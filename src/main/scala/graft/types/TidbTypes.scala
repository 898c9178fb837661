package graft.types

import org.apache.spark.sql.types._

/** TiDB/MySQL column metadata as carried by the reference's schema files.
  *
  * Mirrors the shape of `cloudstorage.TableCol` consumed throughout the
  * reference (constructed at `pkg/tidbsql/ddl.go:179-186`, mapped per
  * warehouse in `pkg/{snowsql,bigquerysql,redshiftsql,databrickssql}/types.go`).
  * String-typed precision/nullable fields follow the reference's JSON
  * contract (FIXTURES.md §2).
  */
final case class TableCol(
    id: String,
    name: String,
    tp: String, // lowercase MySQL type name, possibly with " unsigned"
    precision: String = "",
    scale: String = "",
    nullable: String = "true",
    default: Option[String] = None,
    isPk: String = "false") {

  def isPrimaryKey: Boolean = isPk == "true"
  def precisionInt: Option[Int] = if (precision.isEmpty) None else precision.toIntOption
  def scaleInt: Option[Int] = if (scale.isEmpty) None else scale.toIntOption
}

/** Versioned table definition = the reference's `cloudstorage.TableDefinition`
  * (`replicate/increment.go:45`, schema.json layout in FIXTURES.md §2).
  * `tableVersion` is the commit-TS of the DDL, so schema history is totally
  * ordered by time.
  */
final case class TableDefinition(
    schema: String,
    table: String,
    tableVersion: Long,
    query: String = "",
    tpe: Int = 0,
    columns: Seq[TableCol] = Nil) {

  def isSchemaSeed: Boolean = query.isEmpty // InitSchema, D4
  def pkColumns: Seq[String] = columns.filter(_.isPrimaryKey).map(_.name)

  /** Merge identity: the PK, or for PK-less tables the full row image
    * (the reference just omits the PK clause, `pkg/snowsql/sql.go:99-101`;
    * full-row identity gives its MERGE the same delete/insert effect). */
  def mergeKeys: Seq[String] = if (pkColumns.nonEmpty) pkColumns else columns.map(_.name)

  /** CRC32 over the canonical JSON — the analog of the reference's
    * `TableDefinition.Sum32` checksum verified at `replicate/increment.go:123-135`. */
  def checksum: Long = {
    val crc = new java.util.zip.CRC32()
    crc.update(TableDefJson.write(this.copy(query = query)).getBytes("UTF-8"))
    crc.getValue
  }
}

/** One unified TiDB→Spark type map (SURVEY §1.2): per type we take the
  * widest of the reference's four warehouse mappings so nothing narrows —
  * e.g. `bigint unsigned`→DECIMAL(20,0) follows `pkg/redshiftsql/types.go:35`.
  */
object TidbTypeMapper {

  def toSpark(c: TableCol): DataType = {
    val base = c.tp.stripSuffix(" unsigned").trim
    val unsigned = c.tp.endsWith(" unsigned")
    base match {
      case "tinyint" => if (unsigned) ShortType else ByteType
      case "smallint" => if (unsigned) IntegerType else ShortType
      case "mediumint" | "int" => if (unsigned) LongType else IntegerType
      case "bigint" => if (unsigned) DecimalType(20, 0) else LongType
      case "bit" | "boolean" | "bool" => BooleanType
      case "float" => FloatType
      case "double" => DoubleType
      case "decimal" | "numeric" =>
        DecimalType(c.precisionInt.getOrElse(10), c.scaleInt.getOrElse(0))
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" | "longtext" |
          "enum" | "set" | "json" | "year" | "time" => StringType
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        BinaryType
      case "date" => DateType
      // TiDB DATETIME is wall-clock (no zone) → NTZ; TIMESTAMP is
      // UTC-normalized → session-zoned TimestampType.
      case "datetime" => TimestampNTZType
      case "timestamp" => TimestampType
      case _ => StringType
    }
  }

  def toStructField(c: TableCol): StructField = {
    val meta = new MetadataBuilder()
      .putString("columnId", c.id)
      .putString("mysqlType", c.tp)
      .putBoolean("isPK", c.isPrimaryKey)
    c.default.foreach(d => meta.putString("default", d))
    StructField(c.name, toSpark(c), nullable = c.nullable != "false", meta.build())
  }

  def toStructType(cols: Seq[TableCol]): StructType = StructType(cols.map(toStructField))
}

/** Hand-rolled JSON codec for the reference's schema.json contract
  * (field names per FIXTURES.md §2 / tiflow's cloudstorage encoding).
  * Jackson ships with Spark but a 60-line codec avoids tying the core
  * types module to Spark's shaded deps.
  */
object TableDefJson {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def write(d: TableDefinition): String = {
    val cols = d.columns.map { c =>
      val fields = Seq(
        Some(s""""ColumnId": "${esc(c.id)}""""),
        Some(s""""ColumnName": "${esc(c.name)}""""),
        Some(s""""ColumnType": "${esc(c.tp)}""""),
        if (c.precision.nonEmpty) Some(s""""ColumnPrecision": "${esc(c.precision)}"""") else None,
        if (c.scale.nonEmpty) Some(s""""ColumnScale": "${esc(c.scale)}"""") else None,
        Some(s""""ColumnNullable": "${esc(c.nullable)}""""),
        c.default.map(v => s""""ColumnDefault": "${esc(v)}""""),
        if (c.isPrimaryKey) Some(s""""ColumnIsPk": "true"""") else None
      ).flatten
      fields.mkString("{", ", ", "}")
    }
    s"""{"Table": "${esc(d.table)}", "Schema": "${esc(d.schema)}", "TableVersion": ${d.tableVersion}, """ +
      s""""Query": "${esc(d.query)}", "Type": ${d.tpe}, "TableColumns": [${cols.mkString(", ")}]}"""
  }

  /** Minimal recursive-descent JSON reader, sufficient for schema.json. */
  def parse(s: String): TableDefinition = {
    val p = new P(s)
    val m = p.value().asInstanceOf[Map[String, Any]]
    def str(k: String): String = m.getOrElse(k, "").toString
    def colsOf(v: Any): Seq[TableCol] = v match {
      case xs: Seq[_] => xs.map { x =>
        val cm = x.asInstanceOf[Map[String, Any]]
        def cs(k: String): String = cm.getOrElse(k, "").toString
        TableCol(
          id = cs("ColumnId"), name = cs("ColumnName"), tp = cs("ColumnType"),
          precision = cs("ColumnPrecision"), scale = cs("ColumnScale"),
          nullable = if (cm.contains("ColumnNullable")) cs("ColumnNullable") else "true",
          default = cm.get("ColumnDefault").map(_.toString),
          isPk = if (cm.contains("ColumnIsPk")) cs("ColumnIsPk") else "false")
      }
      case _ => Nil
    }
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case d: Double => d.toLong
      case other => other.toString.toLong
    }
    TableDefinition(
      schema = str("Schema"), table = str("Table"),
      tableVersion = m.get("TableVersion").map(asLong).getOrElse(0L),
      query = str("Query"),
      tpe = m.get("Type").map(asLong(_).toInt).getOrElse(0),
      columns = m.get("TableColumns").map(colsOf).getOrElse(Nil))
  }

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = { ws(); require(s.charAt(i) == c, s"expected $c at $i"); i += 1 }
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => number()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws(); val k = string(); expect(':'); val v = value(); b += (k -> v); ws()
        if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      val b = Seq.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value(); ws()
        if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def number(): Any = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble else t.toLong
    }
  }
}
