package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Every table is a single parquet file under `sfDir`. At 100 TB these
  * would be partitioned directories; `spark.read.parquet` handles both
  * transparently, and all queries below rely on Catalyst pushdown
  * (filters/column pruning reach the parquet scan) rather than any
  * pre-materialization, so the same code scales to a real cluster.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver has shipped `events.ts` in two physical forms: raw
    * ns-epoch int64 (ns-precision parquet read via `nanosAsLong`) and
    * µs-precision timestamp. The engine-internal contract is the
    * former — exact int64 ns arithmetic, matching the oracle's
    * `epoch_ns(ts)` (DuckDB sees a timestamp either way, so the oracle
    * SQL is invariant to the storage form). A timestamp-typed `ts` is
    * converted at the scan boundary; with the session pinned to UTC the
    * NTZ→TZ cast is wall-clock-preserving, so `unix_micros * 1000` is
    * exactly DuckDB's `epoch_ns`. A pure projection — column pruning
    * and pushdown on the other columns are unaffected. */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }

  /** Materialize every persisted index/layout the `*_cached` and
    * layout queries read (IVF inverted lists, neighbor graph, z-order
    * layouts, Bloom index, lexical serving index, crossmodal lists,
    * canonical dedup labels). Build cost is one-time maintenance, not
    * query cost — Bench and the plan lint both run this up front so a
    * missing artifact reads as a build step, never a query failure. */
  def prepareAll(spark: SparkSession, sfDir: String): Unit = {
    val prepares: Seq[(SparkSession, String) => Any] = Seq(
      queries.CurationQueries.prepareCanonicalLabels,
      queries.VectorQueries.prepareIvfIndex,
      queries.VectorQueries.prepareGraphIndex,
      queries.LayoutQueries.prepareEventsLayout,
      queries.LayoutQueries.prepareBloomIndex,
      queries.LayoutQueries.prepareEventsLayout3,
      queries.RetrievalQueries.prepareLexIndex,
      queries.MediaQueries.prepareCrossmodalIvfIndex)
    prepares.foreach { p =>
      try { p(spark, sfDir); () } catch { case _: Throwable => () }
    }
  }
}
