package graft.catalog

import graft.types.TableCol

/** Schema-evolution diff engine (T2): classify prev→curr column sets into
  * ADD / DROP / MODIFY / RENAME / UNCHANGE.
  *
  * Semantics ported from the reference's `CompareColumn`/`GetColumnDiff`
  * (`pkg/tidbsql/ddl.go:31-113`), including ID-based rename detection and
  * the TiDB quirk that MODIFY COLUMN materializes as a same-name column
  * with a NEW column ID (modify-via-temp-column).
  */
object ColumnDiff {

  sealed trait Action
  case object Add extends Action
  case object Drop extends Action
  case object Modify extends Action
  case object Rename extends Action
  case object Unchange extends Action

  final case class Diff(action: Action, prev: Option[TableCol], curr: Option[TableCol])

  private def sameShape(a: TableCol, b: TableCol): Boolean =
    a.tp == b.tp && a.precision == b.precision && a.scale == b.scale &&
      a.nullable == b.nullable && a.default == b.default

  def diff(prev: Seq[TableCol], curr: Seq[TableCol]): Seq[Diff] = {
    val prevById = prev.map(c => c.id -> c).toMap
    val prevByName = prev.map(c => c.name -> c).toMap
    val currById = curr.map(c => c.id -> c).toMap
    val currByName = curr.map(c => c.name -> c).toMap

    val fromCurr: Seq[Diff] = curr.map { c =>
      prevById.get(c.id) match {
        case Some(p) if p.name == c.name =>
          if (sameShape(p, c)) Diff(Unchange, Some(p), Some(c))
          else Diff(Modify, Some(p), Some(c)) // in-place type/attr change
        case Some(p) =>
          Diff(Rename, Some(p), Some(c)) // same ID, new name
        case None =>
          prevByName.get(c.name) match {
            case Some(p) =>
              // same name, new ID: TiDB MODIFY-via-temp-column
              Diff(Modify, Some(p), Some(c))
            case None => Diff(Add, None, Some(c))
          }
      }
    }
    val dropped: Seq[Diff] = prev.collect {
      case p if !currById.contains(p.id) && !currByName.contains(p.name) =>
        Diff(Drop, Some(p), None)
    }
    fromCurr ++ dropped
  }
}
