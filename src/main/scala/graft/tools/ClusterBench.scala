package graft.tools

import graft.{GraftSession, SparkEntry}

/** Repeat-runner for one registered query — the profiling companion to
  * [[graft.Bench]] (which times every query once, cold).
  *
  * Repeated runs in one JVM separate the three cost layers that a
  * single cold timing conflates: run 1 pays codegen + C2 compilation of
  * the query's generated classes, run 2 pays a warm plan against a cold
  * page cache, run 3+ is steady-state engine throughput — the number
  * that actually projects to a long-lived cluster where generated code
  * is compiled once and reused across thousands of tasks.
  *
  *   runMain graft.tools.ClusterBench <sfDir> <query> [reps]
  *   runMain graft.tools.ClusterBench /root/testdata/sf0.1 dedup_embedding 5
  */
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val name = if (args.length > 1) args(1) else "dedup_clusters"
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; one of: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.build(32, "cluster-bench")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sf).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
