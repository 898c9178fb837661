package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry, Tables}

/** Deterministic cost probe for individual queries: counts jobs, stages,
  * tasks and shuffle bytes via a SparkListener while running each named
  * query once. Wall-clock on this box swings ±40% run to run at sf0.1;
  * these structural counters are exactly reproducible, so a plan change
  * can be judged by "fewer stages / fewer shuffle bytes" without
  * re-running a noisy bench N times.
  * Usage: runMain graft.tools.CostProbe <sfDir> q1,q2,... */
object CostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // no name list = the full deck (the round-over-round structural sweep)
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-costprobe")
    Tables.all.foreach(t =>
      try Tables.load(spark, sfDir, t).limit(1).count() catch { case _: Throwable => () })
    Tables.prepareAll(spark, sfDir)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // localCheckpoint blocks are NOT CacheManager entries: left to the
      // ContextCleaner they survive until the frames are GC'd, so probing
      // many queries in one JVM accumulates storage memory and the
      // pressure skews later queries' counters. Unpersist them explicitly.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      // drain listener events before reading the counters (the bus is
      // async): poll until two consecutive reads agree instead of hoping
      // a fixed sleep was long enough on a loaded box
      var settled = false
      var rounds = 0
      while (!settled && rounds < 50) {
        val snap = (jobs.get, stages.get, tasks.get, shufRead.get, shufWrite.get)
        Thread.sleep(100)
        settled = snap == ((jobs.get, stages.get, tasks.get, shufRead.get, shufWrite.get))
        rounds += 1
      }
      println(f"COST $name%-32s jobs=${jobs.get}%-4d stages=${stages.get}%-4d " +
        f"tasks=${tasks.get}%-6d shufR=${shufRead.get}%-10d shufW=${shufWrite.get}%-10d t=$sec%.2f")
    }
    spark.stop()
  }
}
