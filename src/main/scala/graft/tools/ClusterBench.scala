package graft.tools
import graft.GraftSession
object ClusterBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(32, "cluster-bench")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.queries.DedupQueries.dedupClusters(spark, sf).count()
      println(f"run $i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
