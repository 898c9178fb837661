package graft.snapshot

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.types.{TableDefinition, TidbTypeMapper}
import graft.cdc.Envelope

/** Snapshot (bulk) load stage — S1/S7/S8/S11 of SURVEY §2.1.
  *
  * Reads the consistent-snapshot image (dumpling CSV layout
  * `snapshot/{db}.{table}.{NNNN}.csv`, no header, NULL=`\N` — or parquet
  * for our testdata) and materializes the initial target version, then
  * drops the `.loadinfo` stage marker (`replicate/snapshot.go:160-166`).
  *
  * Parallelism: the reference fans out ≤16 concurrent COPYs
  * (`replicate/snapshot.go:23-25`); in Spark per-file parallelism is the
  * scan's partitioning — every CSV chunk is its own split, so a
  * 1000-executor cluster loads 1000 chunks at once with no extra code.
  */
object SnapshotLoader {

  /** Read a dumpling-layout CSV snapshot directory with the table's
    * typed schema (no envelope columns in snapshot files). */
  def readSnapshotCsv(spark: SparkSession, snapshotDir: String, d: TableDefinition): DataFrame =
    spark.read
      .options(Envelope.csvOptions)
      .schema(TidbTypeMapper.toStructType(d.columns))
      .csv(s"$snapshotDir/${d.schema}.${d.table}.*.csv")

  def loadinfoPath(snapshotDir: String, d: TableDefinition): String =
    s"$snapshotDir/${d.schema}.${d.table}.loadinfo"

  def isLoaded(snapshotDir: String, d: TableDefinition): Boolean =
    Files.exists(Paths.get(loadinfoPath(snapshotDir, d)))

  /** Bulk-load the snapshot into the target table (version "snapshot"),
    * skipping if the loadinfo marker says a previous run completed. */
  def load(
      spark: SparkSession,
      snapshot: DataFrame,
      target: TargetTable,
      snapshotDir: String,
      d: TableDefinition): Boolean = {
    if (isLoaded(snapshotDir, d)) return false
    target.writeVersion(snapshot, "snapshot")
    Files.writeString(Paths.get(loadinfoPath(snapshotDir, d)), "loaded")
    true
  }
}
