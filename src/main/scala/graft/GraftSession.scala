package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify/Bench/tests agree.
  *
  * Scale notes: shuffle partitions track core count locally; on a real
  * cluster this plus AQE coalescing sizes reducers to the data. The
  * nanos-as-long legacy flag is required because the `events` table is
  * written with ns-precision timestamps, which Spark's parquet reader
  * otherwise rejects (`PARQUET_TYPE_ILLEGAL`); we read them as ns-epoch
  * longs and convert explicitly where needed.
  */
object GraftSession {
  def build(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE re-plan the output partitioning of cached plans: without
      // this, every .cache()/.persist() subtree materializes with the
      // raw shuffle-partition count (no AQE coalescing), so cached
      // frames carry maximum-width partitioning into every consumer
      // stage — measured 525 -> ~30 tasks on the classifier family at
      // sf0.1, and at cluster scale it sizes cached partitions to the
      // data instead of to spark.sql.shuffle.partitions
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "4096")
      // bare COUNT/MIN/MAX scans answer from parquet footer stats
      // instead of reading row groups — e.g. the PQ pool-sizing count()
      // touches zero data pages at any corpus size
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    graft.functions.Kmv.register(spark)
    graft.functions.Bloom.register(spark)
    spark
  }
}
