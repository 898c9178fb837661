package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ColumnDiff
import graft.catalog.ColumnDiff._
import graft.types.TableCol

/** Seed scenario ported from the reference's only schema-evolution test
  * (`pkg/tidbsql/ddl_test.go:11-88`, via FIXTURES.md §1): MODIFY + RENAME
  * + DROP + UNCHANGE + ADD in one diff. */
class ColumnDiffSpec extends AnyFunSuite {

  private val prev = Seq(
    TableCol("1", "id", "int", precision = "11"),
    TableCol("2", "name", "varchar"),
    TableCol("3", "age", "int"),
    TableCol("4", "birth", "date"))

  private val curr = Seq(
    TableCol("5", "id", "char", precision = "10"),
    TableCol("2", "color", "varchar"),
    TableCol("4", "birth", "date"),
    TableCol("6", "gender", "varchar", precision = "10"))

  test("classifies the reference's five-action scenario") {
    val d = ColumnDiff.diff(prev, curr)
    def actionOf(name: String): Action =
      d.find(x => x.curr.exists(_.name == name) || x.prev.exists(_.name == name)).get.action
    assert(actionOf("id") == Modify) // same name, new ID → modify-via-temp-column
    assert(actionOf("color") == Rename) // same ID 2, new name
    assert(actionOf("age") == Drop)
    assert(actionOf("birth") == Unchange)
    assert(actionOf("gender") == Add)
    assert(d.size == 5)
  }

  test("in-place attribute change on same id+name is Modify") {
    val a = Seq(TableCol("1", "x", "varchar", precision = "10"))
    val b = Seq(TableCol("1", "x", "varchar", precision = "20"))
    assert(ColumnDiff.diff(a, b).map(_.action) == Seq(Modify))
  }

  test("identical schemas diff to all-Unchange") {
    assert(ColumnDiff.diff(prev, prev).map(_.action).forall(_ == Unchange))
  }
}
