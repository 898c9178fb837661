package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.snapshot.{SnapshotLoader, TargetTable}

/** Per-table replication driver (R1 run modes + R2 parallel driver).
  *
  * The reference runs one goroutine per table (`cmd/core.go:263-293`);
  * here each table is one streaming query on a shared SparkSession, and
  * the caller can `spark.streams.awaitAnyTermination()`. Stage gating
  * (snapshot-then-increment, M6/M7) mirrors `cmd/core.go:184-226`.
  */
object ReplicationJob {

  sealed trait RunMode
  case object Full extends RunMode
  case object SnapshotOnly extends RunMode
  case object IncrementalOnly extends RunMode

  /** Snapshot-load if needed, then start the increment stream. The
    * snapshot and changefeed share `cfg.startTso`; change events with
    * commit_ts ≤ startTso are filtered (and would be harmless anyway —
    * keyed MERGE is idempotent, SURVEY §7.4(5)). */
  def replicateTable(
      spark: SparkSession,
      snapshot: => DataFrame,
      snapshotDir: String,
      cfg: PipelineConfig,
      mode: RunMode = Full): Option[StreamingQuery] = {
    val target = cfg.targetTable(spark)
    if (mode != IncrementalOnly && !SnapshotLoader.isLoaded(snapshotDir, cfg.seed)) {
      SnapshotLoader.load(spark, snapshot, target, snapshotDir, cfg.seed)
    }
    if (mode == SnapshotOnly) None
    else Some(new IncrementalPipeline(spark, cfg).start())
  }
}
