package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.cdc.PathCodec
import graft.types.{TableDefinition, TableDefJson}

/** Versioned schema registry (SURVEY §1.1(3)): tableVersion → definition,
  * rebuilt from storage on every start exactly like the reference rebuilds
  * `tableDefMap` each tick (`replicate/increment.go:43-47` — stateless
  * restart).
  *
  * Because our registry is seeded from the snapshot schema, the
  * reference's "at least one DML before DDL" quirk
  * (`replicate/increment.go:291`) does not apply (SURVEY §7.4(7)).
  */
final class SchemaRegistry private (defs: Map[Long, TableDefinition]) {

  def versions: Seq[Long] = defs.keys.toSeq.sorted
  def apply(version: Long): TableDefinition = defs(version)
  def get(version: Long): Option[TableDefinition] = defs.get(version)
  def latest: TableDefinition = defs(versions.last)

  /** Definition in effect for a given version: the greatest registered
    * version ≤ it (DDL events are totally ordered by commit-ts). */
  def effectiveAt(version: Long): TableDefinition = {
    val vs = versions.filter(_ <= version)
    require(vs.nonEmpty, s"no schema registered at or before version $version")
    defs(vs.last)
  }

  def register(d: TableDefinition): SchemaRegistry =
    new SchemaRegistry(defs + (d.tableVersion -> d))

  /** Pending DDL steps between two versions, oldest first (M5 ordering). */
  def ddlBetween(fromExclusive: Long, toInclusive: Long): Seq[TableDefinition] =
    versions.filter(v => v > fromExclusive && v <= toInclusive).map(defs)
}

object SchemaRegistry {

  def apply(seed: TableDefinition): SchemaRegistry =
    new SchemaRegistry(Map(seed.tableVersion -> seed))

  def fromDefinitions(ds: Seq[TableDefinition]): SchemaRegistry = {
    require(ds.nonEmpty, "registry needs at least one definition")
    new SchemaRegistry(ds.map(d => d.tableVersion -> d).toMap)
  }

  /** Walk an increment root for `{schema}/{table}/{version}/schema.json`
    * files (local filesystem flavor of S6's storage walk). */
  def loadFromDir(incrementRoot: String, schema: String, table: String): Option[SchemaRegistry] = {
    val root = Paths.get(incrementRoot)
    if (!Files.isDirectory(root)) return None
    val found = Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      .flatMap { p: Path =>
        PathCodec.parse(p.toString) match {
          case PathCodec.SchemaFile(s, t, _, _) if s == schema && t == table =>
            Some(TableDefJson.parse(Files.readString(p)))
          case _ => None
        }
      }
      .toSeq
    if (found.isEmpty) None else Some(fromDefinitions(found))
  }
}
