package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.PathCodec
import graft.cdc.PathCodec._

class PathCodecSpec extends AnyFunSuite {

  test("parses DML paths with and without partition dir") {
    val p1 = "increment/tpch/orders/449999999999999000/2024-01-02/CDC000001.csv"
    PathCodec.parse(p1) match {
      case DmlFile(k, idx, _) =>
        assert(k == DmlPathKey("tpch", "orders", 449999999999999000L, 0L, "2024-01-02"))
        assert(idx == 1L)
      case other => fail(s"unexpected $other")
    }
    val p2 = "s3://bucket/prefix/increment/tpch/orders/42/7/2024-01-02/CDC000123.csv"
    PathCodec.parse(p2) match {
      case DmlFile(k, idx, _) => assert(k.partitionNum == 7L && idx == 123L)
      case other => fail(s"unexpected $other")
    }
  }

  test("parses schema files (both layouts) and classifies others") {
    assert(PathCodec.parse("increment/tpch/orders/42/schema.json") ==
      SchemaFile("tpch", "orders", 42L, "increment/tpch/orders/42/schema.json"))
    assert(PathCodec.parse("x/tpch/orders/meta/schema_42_123.json") ==
      SchemaFile("tpch", "orders", 42L, "x/tpch/orders/meta/schema_42_123.json", Some(123L)))
    assert(PathCodec.parse("snapshot/tpch.orders.0001.csv").isInstanceOf[OtherFile])
  }

  test("path generation round-trips through parse") {
    val key = DmlPathKey("tpch", "orders", 42L, 0L, "2024-01-02")
    val p = PathCodec.dmlPath("increment", key, 7L)
    PathCodec.parse(p) match {
      case DmlFile(k, idx, _) => assert(k == key && idx == 7L)
      case other => fail(s"unexpected $other")
    }
  }

  test("diffIndexMaps yields only unprocessed ranges (T1)") {
    val k1 = DmlPathKey("s", "t", 1L, 0L, "2024-01-01")
    val k2 = DmlPathKey("s", "t", 1L, 0L, "2024-01-02")
    val k3 = DmlPathKey("s", "t", 2L, 0L, "2024-01-02")
    val cur = Map(k1 -> 5L, k2 -> 3L, k3 -> 2L)
    val done = Map(k1 -> 5L, k2 -> 1L)
    assert(PathCodec.diffIndexMaps(cur, done) == Map(k2 -> (2L, 3L), k3 -> (0L, 2L)))
  }

  test("sortKeys orders by version first (DDL before its DMLs)") {
    val ddl = DmlPathKey("s", "t", 2L, -1L, "")
    val dml1 = DmlPathKey("s", "t", 1L, 0L, "2024-01-01")
    val dml2 = DmlPathKey("s", "t", 2L, 0L, "2024-01-01")
    assert(PathCodec.sortKeys(Seq(dml2, ddl, dml1)) == Seq(dml1, ddl, dml2))
  }
}
