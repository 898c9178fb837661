package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SourceCatalog
import graft.catalog.SourceCatalog.{Row, SqlExecutor}

/** Catalog-bootstrap assembly (S2/S3/S4/O3) against a fixture executor
  * returning canned information_schema / SHOW INDEX / TSO rows — the
  * same shapes `pkg/tidbsql/ddl.go:115-222` and `tso.go:9-23` consume
  * from a live TiDB. */
class SourceCatalogSpec extends AnyFunSuite {

  private def r(kv: (String, String)*): Row = kv.toMap.map { case (k, v) => k -> Option(v) }

  private val fixture = new SqlExecutor {
    def query(sql: String): Seq[Row] = sql match {
      case s if s.contains("information_schema.columns") =>
        Seq(
          r("COLUMN_NAME" -> "id", "DATA_TYPE" -> "bigint", "COLUMN_TYPE" -> "bigint(20)",
            "IS_NULLABLE" -> "NO", "NUMERIC_PRECISION" -> "19", "ORDINAL_POSITION" -> "1"),
          r("COLUMN_NAME" -> "region", "DATA_TYPE" -> "int", "COLUMN_TYPE" -> "int(10) unsigned",
            "IS_NULLABLE" -> "NO", "NUMERIC_PRECISION" -> "10", "ORDINAL_POSITION" -> "2"),
          r("COLUMN_NAME" -> "price", "DATA_TYPE" -> "decimal", "COLUMN_TYPE" -> "decimal(12,2)",
            "IS_NULLABLE" -> "YES", "NUMERIC_PRECISION" -> "12", "NUMERIC_SCALE" -> "2",
            "COLUMN_DEFAULT" -> "0.00", "ORDINAL_POSITION" -> "3"),
          r("COLUMN_NAME" -> "note", "DATA_TYPE" -> "varchar", "COLUMN_TYPE" -> "varchar(255)",
            "IS_NULLABLE" -> "YES", "CHARACTER_MAXIMUM_LENGTH" -> "255", "ORDINAL_POSITION" -> "4"),
          r("COLUMN_NAME" -> "created", "DATA_TYPE" -> "datetime", "COLUMN_TYPE" -> "datetime(3)",
            "IS_NULLABLE" -> "YES", "DATETIME_PRECISION" -> "3", "ORDINAL_POSITION" -> "5"),
          r("COLUMN_NAME" -> "derived", "DATA_TYPE" -> "bigint", "COLUMN_TYPE" -> "bigint(20)",
            "IS_NULLABLE" -> "YES", "EXTRA" -> "VIRTUAL GENERATED", "ORDINAL_POSITION" -> "6"))
      case s if s.startsWith("SHOW INDEX") =>
        Seq( // deliberately unordered + a secondary index to be ignored
          r("KEY_NAME" -> "idx_note", "COLUMN_NAME" -> "note", "SEQ_IN_INDEX" -> "1"),
          r("KEY_NAME" -> "PRIMARY", "COLUMN_NAME" -> "region", "SEQ_IN_INDEX" -> "2"),
          r("KEY_NAME" -> "PRIMARY", "COLUMN_NAME" -> "id", "SEQ_IN_INDEX" -> "1"))
      case s if s.contains("@@tidb_current_ts") =>
        Seq(r("@@tidb_current_ts" -> "449348837152131073"))
      case other => fail(s"unexpected catalog query: $other")
    }
  }

  test("S3: columns assemble in ordinal order with reference precision rules") {
    val cols = SourceCatalog.columns(fixture, "tpch", "orders")
    assert(cols.map(_.name) == Seq("id", "region", "price", "note", "created"),
      "VIRTUAL GENERATED columns are skipped; ordinal order kept")
    assert(cols.find(_.name == "region").get.tp == "int unsigned")
    val price = cols.find(_.name == "price").get
    assert(price.precision == "12" && price.scale == "2" && price.default.contains("0.00"))
    assert(cols.find(_.name == "note").get.precision == "255") // char length fallback
    assert(cols.find(_.name == "created").get.precision == "3") // datetime precision
    assert(cols.find(_.name == "id").get.nullable == "false")
    assert(cols.find(_.name == "price").get.nullable == "true")
  }

  test("S4/O3: PK columns come back in index-sequence order, numerically sorted") {
    assert(SourceCatalog.primaryKey(fixture, "tpch", "orders") == Seq("id", "region"))
  }

  test("S2: TSO capture") {
    assert(SourceCatalog.currentTso(fixture) == 449348837152131073L)
  }

  test("D4: tableDefinition marks PKs, defaults version to the capture TSO") {
    val d = SourceCatalog.tableDefinition(fixture, "tpch", "orders")
    assert(d.pkColumns == Seq("id", "region"))
    assert(d.mergeKeys == Seq("id", "region"))
    assert(d.tableVersion == 449348837152131073L)
    assert(d.columns.find(_.name == "region").get.nullable == "false")
  }

  test("PK-less tables fall back to full-row merge identity") {
    val noPk = new SqlExecutor {
      def query(sql: String): Seq[Row] =
        if (sql.startsWith("SHOW INDEX")) Nil else fixture.query(sql)
    }
    val d = SourceCatalog.tableDefinition(noPk, "tpch", "orders", tableVersion = Some(7L))
    assert(d.pkColumns.isEmpty)
    assert(d.mergeKeys == Seq("id", "region", "price", "note", "created"))
    assert(d.tableVersion == 7L)
  }

  test("JdbcSnapshot: chunked read options pin the TSO per connection") {
    import graft.snapshot.JdbcSnapshot
    val d = SourceCatalog.tableDefinition(fixture, "tpch", "orders", Some(42L))
    val opts = JdbcSnapshot.options("jdbc:mysql://h:4000/tpch", d, tso = 449L,
      numPartitions = 8, bounds = Some((0L, 100000L)))
    assert(opts("dbtable") == "`tpch`.`orders`")
    assert(opts("sessionInitStatement") == "SET SESSION tidb_snapshot = 449")
    assert(opts("partitionColumn") == "id") // first INTEGER pk; region is unsigned int → long, but id comes first
    assert(opts("numPartitions") == "8" && opts("lowerBound") == "0" && opts("upperBound") == "100000")
    // no integer PK → single-partition fallback, no range options
    val noPk = new SqlExecutor {
      def query(sql: String): Seq[Row] =
        if (sql.startsWith("SHOW INDEX")) Nil else fixture.query(sql)
    }
    val opts2 = JdbcSnapshot.options("u", SourceCatalog.tableDefinition(noPk, "tpch", "orders", Some(1L)), 449L, 8, Some((0L, 10L)))
    assert(!opts2.contains("partitionColumn") && !opts2.contains("numPartitions"))
  }

  test("identifiers and strings are escaped into catalog SQL") {
    assert(SourceCatalog.columnsQuery("a'b", "t").contains("a''b"))
    assert(SourceCatalog.pkQuery("s", "weird`name").contains("`weird``name`"))
  }
}
