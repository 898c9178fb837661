package graft.tools

import graft.{GraftSession, SparkEntry, Tables}

/** Wall-clock microbench for individual SparkEntry queries at sf0.1:
  * warms the session, then times each named query twice (cache cleared
  * between queries, second pass shows steady-state past JIT/footer
  * costs). Usage: runMain graft.tools.TimeQueries q1_pricing,vec_topk */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(32, "graft-timing")
    Tables.all.foreach(t =>
      try Tables.load(spark, sfDir, t).limit(1).count() catch { case _: Throwable => () })
    def time(name: String): Unit = {
      val t0 = System.nanoTime(); val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMING $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val qs = args.toSeq.flatMap(_.split(","))
    qs.foreach(time); qs.foreach(time)
    spark.stop()
  }
}
