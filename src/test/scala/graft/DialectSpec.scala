package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dialects._
import graft.types.{TableCol, TableDefinition}
import graft.catalog.SchemaEvolution.Action

/** Field-for-field checks of the four warehouse SQL generators against
  * the reference's shapes (`pkg/{snowsql,bigquerysql,redshiftsql,
  * databrickssql}`), plus an executable-parity test: the Databricks
  * dialect's generated SQL is run by Spark itself and must compute the
  * same latest-per-key result as the engine's `ChangeApply`.
  */
class DialectSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "dialect-spec")

  private val id = TableCol("1", "id", "bigint", isPk = "true", nullable = "false")
  private val name = TableCol("2", "name", "varchar", precision = "255")
  private val price = TableCol("3", "price", "decimal", precision = "10", scale = "2")
  private val payload = TableCol("4", "payload", "blob", precision = "1024")
  private val created = TableCol("5", "created", "datetime", precision = "3")
  private val d = TableDefinition("db", "items", 100L,
    columns = Seq(id, name, price, payload, created))

  // ---- type maps: the rows where the four dialects genuinely differ ----

  test("type maps diverge exactly where the reference's do") {
    val ubig = TableCol("9", "n", "bigint unsigned")
    assert(SnowflakeDialect.typeString(ubig) == "NUMBER") // snowsql/types.go:35
    assert(BigQueryDialect.typeString(ubig) == "NUMERIC") // bigquerysql/types.go:14
    assert(RedshiftDialect.typeString(ubig) == "DECIMAL(20,0)") // redshiftsql/types.go:35
    // databricks has no unsigned entries at all (types.go:15-41)
    assertThrows[IllegalArgumentException](DatabricksDialect.typeString(ubig))

    assert(SnowflakeDialect.typeString(payload) == "BINARY(1024)")
    assert(BigQueryDialect.typeString(payload) == "BYTES")
    assert(RedshiftDialect.typeString(payload) == "VARBYTE(1024)")
    assert(DatabricksDialect.typeString(payload) == "STRING") // CSV external tables can't do BINARY

    // oversized blobs: rejected by the sized-binary dialects, fine elsewhere
    val huge = TableCol("9", "b", "longblob")
    assertThrows[IllegalArgumentException](SnowflakeDialect.typeString(huge))
    assertThrows[IllegalArgumentException](RedshiftDialect.typeString(huge))
    assert(BigQueryDialect.typeString(huge) == "BYTES")
    assert(DatabricksDialect.typeString(huge) == "STRING")

    // bigquery is the only dialect mapping json/set/bit/year
    assert(BigQueryDialect.typeString(TableCol("9", "j", "json")) == "STRING")
    assert(BigQueryDialect.typeString(TableCol("9", "b", "bit")) == "BOOL")
    assert(BigQueryDialect.typeString(TableCol("9", "y", "year")) == "INT64")
    assertThrows[IllegalArgumentException](SnowflakeDialect.typeString(TableCol("9", "j", "json")))

    // time/datetime handling
    assert(SnowflakeDialect.typeString(created) == "DATETIME(3)") // sized
    assert(RedshiftDialect.typeString(created) == "TIMESTAMP") // unsized
    assert(DatabricksDialect.typeString(created) == "TIMESTAMP_NTZ")
  }

  test("column strings render defaults and nullability per dialect") {
    val withDefault = name.copy(default = Some("n/a"), nullable = "false")
    val numDefault = price.copy(default = Some("0.99"))
    // numeric defaults unquoted, strings quoted (snowsql/sql.go:70-76)
    assert(SnowflakeDialect.columnString(withDefault) == "name VARCHAR(255) NOT NULL DEFAULT 'n/a'")
    assert(SnowflakeDialect.columnString(numDefault) == "price NUMBER(10, 2) DEFAULT 0.99")
    // redshift adds DEFAULT NULL on defaultless nullable cols (ddl.go:95-97)
    assert(RedshiftDialect.columnString(name) == "name VARCHAR(255) DEFAULT NULL")
    // databricks/Delta: no defaults ever (ddl.go:85-86)
    assert(DatabricksDialect.columnString(withDefault) == "name STRING NOT NULL")
    // bigquery create-table: DEFAULT NULL precedes NOT NULL (ddl.go:115-123)
    assert(BigQueryDialect.columnString(name, createTable = true) == "`name` STRING DEFAULT NULL")
    assert(BigQueryDialect.columnString(id, createTable = true) == "`id` INT64 NOT NULL")
  }

  test("create table per dialect") {
    val sf = SnowflakeDialect.createTableSql(d)
    assert(sf.startsWith("CREATE OR REPLACE TABLE items ("))
    assert(sf.contains("    id NUMBER NOT NULL"))
    assert(sf.contains("    PRIMARY KEY (id)"))

    val rs = RedshiftDialect.createTableSql(d)
    assert(rs.startsWith("CREATE TABLE items (")) // no OR REPLACE
    assert(rs.contains("PRIMARY KEY (id)"))

    val bq = BigQueryDialect.createTableSql(d, "ds")
    assert(bq.startsWith("CREATE OR REPLACE TABLE ds.items ("))
    assert(bq.contains("PRIMARY KEY (`id`) NOT ENFORCED"))

    val dbx = DatabricksDialect.createTableSql(d)
    assert(dbx.startsWith("CREATE TABLE items ("))
    assert(!dbx.contains("PRIMARY KEY")) // Delta declares none
  }

  // ---- alter generation ----

  test("add/drop/rename columns") {
    val added = d.copy(columns = d.columns :+ TableCol("6", "note", "text"))
    assert(SnowflakeDialect.alterSql(d.columns, added) ==
      Seq("ALTER TABLE items ADD COLUMN note TEXT;"))
    // bigquery: backticked ref + follow-up SET DEFAULT NULL for nullable adds
    assert(BigQueryDialect.alterSql(d.columns, added) == Seq(
      "ALTER TABLE `db.items` ADD COLUMN `note` STRING;",
      "ALTER TABLE `db.items` ALTER COLUMN `note` SET DEFAULT NULL;"))
    // bigquery rejects add-with-default (ddl.go:69-71)
    val addedDef = d.copy(columns = d.columns :+ TableCol("6", "note", "text", default = Some("x")))
    assertThrows[IllegalArgumentException](BigQueryDialect.alterSql(d.columns, addedDef))

    val dropped = d.copy(columns = d.columns.filterNot(_.name == "name"))
    assert(RedshiftDialect.alterSql(d.columns, dropped) ==
      Seq("ALTER TABLE items DROP COLUMN name;"))
    assert(BigQueryDialect.alterSql(d.columns, dropped) ==
      Seq("ALTER TABLE `db.items` DROP COLUMN `name`;"))

    val renamed = d.copy(columns = d.columns.map(c =>
      if (c.id == "2") c.copy(name = "title") else c))
    assert(DatabricksDialect.alterSql(d.columns, renamed) ==
      Seq("ALTER TABLE items RENAME COLUMN name TO title;"))
    // reference quirk: bigquery renames are UNQUOTED (ddl.go:92-93)
    assert(BigQueryDialect.alterSql(d.columns, renamed) ==
      Seq("ALTER TABLE db.items RENAME COLUMN name TO title;"))
  }

  test("modify column: supported on snowflake/bigquery, rejected on redshift/databricks") {
    // same ID, widened precision = MODIFY
    val modified = d.copy(columns = d.columns.map(c =>
      if (c.id == "2") c.copy(precision = "512") else c))
    assert(SnowflakeDialect.alterSql(d.columns, modified) ==
      Seq("ALTER TABLE items MODIFY COLUMN name VARCHAR(512);"))
    assert(BigQueryDialect.alterSql(d.columns, modified) ==
      Seq("ALTER TABLE `db.items` ALTER COLUMN `name` SET DATA TYPE STRING;"))
    assertThrows[IllegalArgumentException](RedshiftDialect.alterSql(d.columns, modified))
    assertThrows[IllegalArgumentException](DatabricksDialect.alterSql(d.columns, modified))

    // nullability toggles (snowsql/ddl.go:31-37)
    val tightened = d.copy(columns = d.columns.map(c =>
      if (c.id == "2") c.copy(nullable = "false") else c))
    assert(SnowflakeDialect.alterSql(d.columns, tightened) ==
      Seq("ALTER TABLE items MODIFY COLUMN name SET NOT NULL;"))
    // bigquery can only loosen (ddl.go:26-31): tightening renders nothing
    assert(BigQueryDialect.alterSql(d.columns, tightened).isEmpty)
  }

  test("table-level DDL passthrough and rejection") {
    val trunc = d.copy(tpe = Action.TruncateTable)
    assert(SnowflakeDialect.alterSql(d.columns, trunc) == Seq("TRUNCATE TABLE items"))
    assert(BigQueryDialect.alterSql(d.columns, trunc) == Seq("TRUNCATE TABLE `db.items`"))

    val dropSchema = d.copy(tpe = Action.DropSchema)
    assert(SnowflakeDialect.alterSql(d.columns, dropSchema) == Seq("DROP SCHEMA db"))
    assert(RedshiftDialect.alterSql(d.columns, dropSchema) == Seq("DROP SCHEMA db CASCADE"))
    assert(DatabricksDialect.alterSql(d.columns, dropSchema) == Seq("DROP SCHEMA db CASCADE"))
    assertThrows[IllegalArgumentException](BigQueryDialect.alterSql(d.columns, dropSchema))

    Dialects.all.foreach { dia =>
      assertThrows[IllegalArgumentException](
        dia.alterSql(d.columns, d.copy(tpe = Action.RenameTables)))
      assertThrows[IllegalArgumentException](
        dia.alterSql(d.columns, d.copy(tpe = Action.CreateTable)))
    }
  }

  // ---- merge generation ----

  test("snowflake merge: positional stage projection, hex decode, QUALIFY") {
    val Seq(sql) = SnowflakeDialect.mergeSql(d, StagingRef(stageName = "stg", filePath = "f.csv"))
    assert(sql.contains("MERGE INTO items AS T USING"))
    assert(sql.contains("""$1 AS "METADATA$FLAG""""))
    assert(sql.contains("$5 AS id")) // data starts at $5 (snowsql/sql.go:117-124)
    assert(sql.contains("TO_BINARY($8, 'HEX') AS payload")) // 4th data col
    assert(sql.contains("FROM '@stg/f.csv'"))
    assert(sql.contains("QUALIFY row_number() over (partition by id order by $4 desc) = 1"))
    assert(sql.contains("WHEN MATCHED AND S.METADATA$FLAG != 'D' THEN UPDATE SET id = S.id"))
    assert(sql.contains("WHEN MATCHED AND S.METADATA$FLAG = 'D' THEN DELETE"))
    assert(sql.contains("WHEN NOT MATCHED AND S.METADATA$FLAG != 'D' THEN INSERT (id, name, price, payload, created) VALUES (S.id, S.name, S.price, S.payload, S.created);"))
  }

  test("bigquery/databricks merge: staging table + EXCEPT(row_num); redshift: DELETE+INSERT") {
    val Seq(bq) = BigQueryDialect.mergeSql(d, StagingRef(dataset = "ds", stagingTable = "items_stg"))
    assert(bq.contains("MERGE INTO `ds.items` AS T USING"))
    assert(bq.contains("SELECT * EXCEPT(row_num)"))
    assert(bq.contains("order by tidb2dw_commit_ts desc"))
    assert(bq.contains("FROM `ds.items_stg`"))
    assert(bq.contains("WHEN MATCHED AND S.tidb2dw_flag != 'D' THEN UPDATE SET `id` = S.id"))

    val Seq(dbx) = DatabricksDialect.mergeSql(d, StagingRef(stagingTable = "items_ext"))
    assert(dbx.contains("MERGE INTO `items` AS T USING"))
    assert(dbx.contains("FROM `items_ext`"))
    assert(dbx.contains("WHEN MATCHED AND S.tidb2dw_flag != 'D' THEN UPDATE SET id = S.id"))

    val Seq(del, ins) = RedshiftDialect.mergeSql(d, StagingRef(stagingTable = "items_tmp"))
    assert(del.startsWith("DELETE FROM items USING ("))
    assert(del.contains("QUALIFY row_number() OVER (PARTITION BY id ORDER BY committs DESC) = 1"))
    assert(del.contains("WHERE tablename IS NOT NULL"))
    assert(ins.startsWith("INSERT INTO items"))
    assert(ins.contains("S.flag != 'D'"))
  }

  test("staging helpers: redshift temp table, databricks external table, meta columns") {
    val tmp = RedshiftDialect.createIncrementalTableSql(d.columns, "items_tmp")
    assert(tmp.startsWith("CREATE TEMP TABLE IF NOT EXISTS items_tmp ("))
    // 4 positional meta cols before the data cols (redshiftsql/sql.go:107-113)
    assert(tmp.indexOf("FLAG VARCHAR(10)") < tmp.indexOf("TABLENAME VARCHAR(255)"))
    assert(tmp.indexOf("COMMITTS BIGINT") < tmp.indexOf("id BIGINT"))

    val ext = DatabricksDialect.createExternalTableSql("items_ext", d.columns, "s3://bkt/incr")
    assert(ext.contains("USING CSV"))
    assert(ext.contains("LOCATION 's3://bkt/incr'"))

    val meta = Dialects.incrementTableColumns(d.columns)
    assert(meta.take(4).map(_.name) ==
      Seq("tidb2dw_flag", "tidb2dw_tablename", "tidb2dw_schemaname", "tidb2dw_commit_ts"))
    assert(meta.drop(4) == d.columns)
  }

  test("binary csv dialect: base64 only for bigquery (cmd/core.go:59-73)") {
    assert(SnowflakeDialect.binaryDialect == "hex")
    assert(RedshiftDialect.binaryDialect == "hex")
    assert(DatabricksDialect.binaryDialect == "hex")
    assert(BigQueryDialect.binaryDialect == "base64")
    assert(Dialects.csvOutputBinaryDialect("bigquery") == "base64")
    assert(Dialects.csvOutputBinaryDialect("snowflake") == "hex")
    assert(Dialects.forName("Redshift").name == "redshift")
    assertThrows[IllegalArgumentException](Dialects.forName("oracle"))
  }

  // ---- executable parity: Databricks SQL is Spark SQL ----

  test("databricks-generated SQL executes on Spark and matches ChangeApply") {
    import spark.implicits._

    // a change batch: two versions of key 1, a delete of key 2, insert of key 3
    val batch = Seq(
      ("U", "items", "db", 10L, 1L, "a1"),
      ("U", "items", "db", 20L, 1L, "a2"),
      ("D", "items", "db", 15L, 2L, "b"),
      ("I", "items", "db", 5L, 3L, "c"))
      .toDF("tidb2dw_flag", "tidb2dw_tablename", "tidb2dw_schemaname",
        "tidb2dw_commit_ts", "id", "name")

    // 1) cast-and-rename projection runs as-is over positional _c cols
    val raw = batch.toDF((0 until 6).map(i => s"_c$i"): _*)
      .selectExpr("CAST(_c3 AS STRING) AS _c0", "CAST(_c4 AS STRING) AS _c1",
        "CAST(_c5 AS STRING) AS _c2")
      .toDF("_c0", "_c1", "_c2")
    val proj = DatabricksDialect.castAndRenameProjection(
      Seq(TableCol("1", "ts", "bigint"), TableCol("2", "id", "bigint"),
        TableCol("3", "name", "varchar", precision = "10")))
    val typed = raw.selectExpr(proj.split(", (?=cast)"): _*)
    assert(typed.schema.map(_.dataType.typeName) == Seq("long", "long", "string"))
    assert(typed.count() == 4)

    // 2) the merge's latest-per-key staging subquery is valid Spark SQL
    //    and agrees with the engine's hash-agg dedup
    batch.createOrReplaceTempView("items_ext")
    val Seq(merge) = DatabricksDialect.mergeSql(
      TableDefinition("db", "items", 1L, columns = Seq(
        TableCol("1", "id", "bigint", isPk = "true"),
        TableCol("2", "name", "varchar", precision = "10"))),
      StagingRef(stagingTable = "items_ext"))
    val sub = merge.substring(merge.indexOf("(") + 1, merge.lastIndexOf(") AS S"))
    val viaSql = spark.sql(sub)
      .select($"id", $"name", $"tidb2dw_flag", $"tidb2dw_commit_ts")
    val viaEngine = graft.merge.ChangeApply
      .dedupLatestPerKey(batch, Seq("id"))
      .select($"id", $"name", $"tidb2dw_flag", $"tidb2dw_commit_ts")
    assert(viaSql.except(viaEngine).isEmpty && viaEngine.except(viaSql).isEmpty)
  }
}
