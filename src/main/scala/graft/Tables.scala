package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
