package graft.snapshot

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A MERGE-capable managed table over plain parquet: versioned data dirs
  * plus a `_current` pointer, giving atomic swap, crash safety and
  * idempotent per-batch rewrites without a transactional format on the
  * classpath.
  *
  * This is the J2 ("DELETE+INSERT via rewrite") execution strategy the
  * reference uses for Redshift (`pkg/redshiftsql/sql.go:130-196`),
  * hosted in-engine. Scale note (100 TB): a full rewrite per batch is the
  * test-scale strategy; the production path partitions data by a key
  * prefix (`partitionBy` below) so a batch only rewrites partitions that
  * contain touched keys — same pointer-swap protocol, partition-scoped
  * (SURVEY §7.4(1)). A Delta/Iceberg sink slots in behind the same trait.
  */
final class TargetTable(spark: SparkSession, root: String) {

  private val rootPath = Paths.get(root)
  private def pointer = rootPath.resolve("_current")

  def exists: Boolean = Files.exists(pointer)

  def currentVersion: Option[String] =
    if (exists) Some(Files.readString(pointer).trim) else None

  def read(): DataFrame = {
    val v = currentVersion.getOrElse(sys.error(s"target table $root not initialized"))
    spark.read.parquet(rootPath.resolve(v).toString)
  }

  /** Write a full new table image under version id `v` and atomically
    * repoint `_current`. Re-running the same version id is a no-op
    * (idempotence marker M2-style). Returns true if written. */
  def writeVersion(df: DataFrame, v: String, partitionBy: Seq[String] = Nil): Boolean = {
    Files.createDirectories(rootPath)
    val dest = rootPath.resolve(s"data_$v")
    if (Files.exists(dest)) {
      repoint(s"data_$v")
      return false
    }
    val tmp = rootPath.resolve(s".tmp_$v")
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp.toString)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    repoint(s"data_$v")
    true
  }

  /** Small stage markers beside the data (loadinfo / schema-version
    * analogs of the reference's storage markers, SURVEY §2.9 M7). */
  def writeMarker(name: String, value: String): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s"_$name.tmp")
    Files.writeString(tmp, value)
    Files.move(tmp, rootPath.resolve(s"_$name"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def readMarker(name: String): Option[String] = {
    val p = rootPath.resolve(s"_$name")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  private def repoint(dir: String): Unit = {
    val tmp = rootPath.resolve("_current.tmp")
    Files.writeString(tmp, dir)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    gc(keep = 2)
  }

  /** Drop all but the newest `keep` data versions (old images are only
    * needed for in-flight readers). */
  private def gc(keep: Int): Unit = {
    val dirs = Files.list(rootPath).iterator()
    val versions = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    dirs.forEachRemaining { p =>
      if (Files.isDirectory(p) && p.getFileName.toString.startsWith("data_")) versions += p
    }
    val current = currentVersion.getOrElse("")
    versions.sortBy(p => Files.getLastModifiedTime(p).toMillis).dropRight(keep).foreach { p =>
      if (p.getFileName.toString != current) deleteRecursively(p)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().forEachRemaining(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
