package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M8 realized in-stream: watermarked, windowed aggregation over the
  * live change stream — change rates per table and op, the streaming
  * analog of the reference's rows-loaded metrics but computed as a
  * first-class Structured Streaming windowed agg (late events beyond
  * the watermark are dropped, state is bounded, update-mode sinks get
  * per-window refinements).
  *
  * Scale: the envelope prefix is extracted with one regexp (no
  * full-width CSV parse — stats don't need the row image), the window
  * agg partial-aggregates map-side, and state size is
  * O(windows × tables × ops) regardless of row volume.
  */
object ChangeStats {

  /** `"I","orders","tpch","449348837152131073",…` → (flag, table, ts).
    * Metadata columns are engine-generated (never contain quotes), so a
    * prefix regexp is exact. Commit-ts is a TiDB TSO: physical
    * milliseconds live in the top 46 bits (<< 18). */
  private val EnvelopePrefix = """^"([IUD])","([^"]*)","([^"]*)","(\d+)".*"""

  def changeRates(
      spark: SparkSession,
      cfg: PipelineConfig,
      window: String = "1 minute",
      watermark: String = "2 minutes",
      tsoTimestamps: Boolean = false): DataFrame = {
    val lines = spark.readStream
      .format("text")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "CDC*.csv")
      .load(s"${cfg.incrementRoot}/${cfg.schemaName}/${cfg.tableName}")
    val ts = regexp_extract(col("value"), EnvelopePrefix, 4).cast("long")
    val millis = if (tsoTimestamps) shiftrightunsigned(ts, 18) else ts * 1000L
    lines
      .select(
        regexp_extract(col("value"), EnvelopePrefix, 1).as("flag"),
        regexp_extract(col("value"), EnvelopePrefix, 2).as("table"),
        timestamp_millis(millis).as("commit_time"))
      .filter(col("flag") =!= "") // non-envelope lines never count
      .withWatermark("commit_time", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("commit_time"), window).as("w"),
        col("table"), col("flag"))
      .agg(count(lit(1)).as("n_changes"))
      .select(col("w.start").as("win_start"), col("table"), col("flag"), col("n_changes"))
  }
}
