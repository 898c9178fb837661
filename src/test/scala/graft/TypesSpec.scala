package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.types.{TableCol, TableDefinition, TableDefJson, TidbTypeMapper}

class TypesSpec extends AnyFunSuite {

  test("type map widens unsigned per the reference's safest mapping") {
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "bigint")) == LongType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "bigint unsigned")) == DecimalType(20, 0))
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "int unsigned")) == LongType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "smallint unsigned")) == IntegerType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "decimal", "15", "2")) == DecimalType(15, 2))
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "varchar")) == StringType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "mediumblob")) == BinaryType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "datetime")) == TimestampNTZType)
    assert(TidbTypeMapper.toSpark(TableCol("1", "a", "timestamp")) == TimestampType)
  }

  test("struct field carries PK/columnId metadata") {
    val f = TidbTypeMapper.toStructField(TableCol("7", "k", "bigint", nullable = "false", isPk = "true"))
    assert(f.name == "k" && !f.nullable)
    assert(f.metadata.getBoolean("isPK"))
    assert(f.metadata.getString("columnId") == "7")
  }

  test("schema.json round-trips through the codec (FIXTURES.md §2 shape)") {
    val d = TableDefinition(
      schema = "tpch", table = "orders", tableVersion = 449999999999999000L,
      columns = Seq(
        TableCol("1", "o_orderkey", "bigint", precision = "19", nullable = "false", isPk = "true"),
        TableCol("2", "o_custkey", "bigint", precision = "19"),
        TableCol("3", "o_totalprice", "decimal", precision = "15", scale = "2")))
    val parsed = TableDefJson.parse(TableDefJson.write(d))
    assert(parsed == d)
    assert(parsed.pkColumns == Seq("o_orderkey"))
    assert(parsed.isSchemaSeed)
  }

  test("parses the reference-shaped fixture json") {
    val json =
      """{"Table": "orders", "Schema": "tpch", "TableVersion": 449999999999999000,
        | "Query": "", "Type": 0,
        | "TableColumns": [
        |  {"ColumnId": "1", "ColumnName": "o_orderkey", "ColumnType": "bigint",
        |   "ColumnPrecision": "19", "ColumnNullable": "false", "ColumnIsPk": "true"},
        |  {"ColumnId": "3", "ColumnName": "o_totalprice", "ColumnType": "decimal",
        |   "ColumnPrecision": "15", "ColumnScale": "2", "ColumnNullable": "true"}]}""".stripMargin
    val d = TableDefJson.parse(json)
    assert(d.table == "orders" && d.tableVersion == 449999999999999000L)
    assert(d.columns.map(_.name) == Seq("o_orderkey", "o_totalprice"))
    assert(d.columns.head.isPrimaryKey)
    assert(TidbTypeMapper.toStructType(d.columns).fields.map(_.dataType).toSeq ==
      Seq(LongType, DecimalType(15, 2)))
  }

  test("checksum is stable and content-sensitive") {
    val d = TableDefinition("s", "t", 1L, columns = Seq(TableCol("1", "a", "int")))
    assert(d.checksum == d.copy().checksum)
    assert(d.checksum != d.copy(tableVersion = 2L).checksum)
  }
}
