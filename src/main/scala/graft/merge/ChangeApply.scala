package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.Envelope

/** The semantic core of the engine: change-batch dedup + keyed MERGE.
  *
  * Implements the two operators every reference warehouse executes as
  * generated SQL:
  *
  *  - A1 latest-row-per-key dedup — the `QUALIFY row_number() OVER
  *    (PARTITION BY pk ORDER BY commit_ts DESC) = 1` collapse applied to
  *    every change batch (`pkg/snowsql/sql.go:151-157` and the three
  *    sibling dialects).
  *  - J1/J2 MERGE — `WHEN MATCHED AND flag!='D' UPDATE; WHEN MATCHED AND
  *    flag='D' DELETE; WHEN NOT MATCHED AND flag!='D' INSERT`
  *    (`pkg/snowsql/sql.go:115-177`), expressed Spark-first as the
  *    left-anti + union rewrite the reference itself uses for Redshift
  *    (`pkg/redshiftsql/sql.go:130-196`).
  *
  * Scale notes (100 TB): the change batch is orders of magnitude smaller
  * than the target, so the anti-join's build side (just the PK columns of
  * the deduped batch) is broadcastable — AQE converts it at runtime; for
  * a partitioned target only partitions containing touched keys need
  * rewriting (partition-scoped variant below). Dedup uses `max_by` over a
  * single hash aggregation: partial (map-side) aggregation instead of the
  * window's full shuffle+sort-per-partition, so it scales with distinct
  * keys, not batch rows.
  */
object ChangeApply {

  /** A1: keep the newest row image per PK. `max_by(struct(cols), ts)`
    * = one hash-agg with map-side combine; ties on `tsCol` are broken by
    * the remaining struct fields to stay deterministic (the reference
    * relies on commit-ts uniqueness per key and is nondeterministic on
    * ties). */
  def dedupLatestPerKey(
      batch: DataFrame,
      pks: Seq[String],
      tsCol: String = Envelope.CommitTsCol): DataFrame = {
    require(pks.nonEmpty, "dedup requires at least one key column")
    val valueCols = batch.columns.filterNot(pks.contains)
    val ordered = struct((tsCol +: valueCols.toSeq.filterNot(_ == tsCol)).map(col): _*)
    batch
      .groupBy(pks.map(col): _*)
      .agg(max(ordered).as("_latest"))
      .select(pks.map(col) ++ valueCols.map(c => col(s"_latest.`$c`").as(c)): _*)
  }

  /** Window-based A1 variant (row_number desc = 1) — the literal shape of
    * the reference's QUALIFY; kept for semantics tests and as the
    * fallback when value columns aren't struct-orderable (e.g. maps). */
  def dedupLatestPerKeyWindow(
      batch: DataFrame,
      pks: Seq[String],
      tsCol: String = Envelope.CommitTsCol): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pks.map(col): _*).orderBy(col(tsCol).desc)
    batch.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** J1/J2: apply a deduped-or-raw change batch to a snapshot/target.
    *
    * Result = target rows whose key is untouched
    *        ∪ final row images of touched keys whose last op ≠ Delete.
    *
    * Idempotent per batch (re-applying yields the same table), which is
    * the invariant the reference leans on for at-least-once replay
    * (SURVEY §2.9 M2/M6).
    */
  def applyChanges(
      target: DataFrame,
      batch: DataFrame,
      pks: Seq[String],
      tsCol: String = Envelope.CommitTsCol,
      flagCol: String = Envelope.FlagCol): DataFrame =
    // cached: applyLatest reads `latest` twice (upsert rows + the
    // anti-join key side), which would run the dedup aggregation twice
    applyLatest(target, dedupLatestPerKey(batch, pks, tsCol).cache(), pks, flagCol)

  /** Same as [[applyChanges]] but for an already-deduped batch — the
    * streaming pipeline dedups first so it can derive the touched-bucket
    * set from the same `latest` frame (partition-scoped merge). */
  def applyLatest(
      target: DataFrame,
      latest: DataFrame,
      pks: Seq[String],
      flagCol: String = Envelope.FlagCol): DataFrame = {
    val dataCols = target.columns.toSeq
    val upserts = latest.filter(col(flagCol) =!= Envelope.Delete)
      .select(dataCols.map(col): _*)
    val touched = latest.select(pks.map(col): _*)
    // left-anti against just the touched keys: tiny build side → AQE
    // broadcasts it; the target is never shuffled.
    target.join(touched, pks, "left_anti").unionByName(upserts)
  }
}
