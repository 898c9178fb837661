package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Shuffle-amplification audit — the numbers behind the 100 TB claims.
  *
  * For each query it accounts, from task metrics: bytes read from
  * files, shuffle bytes written/read, task and stage counts, and the
  * largest single task's shuffle write (the skew proxy — a balanced
  * exchange keeps it near shuffleWrite/tasks; a hot key drags it toward
  * the whole exchange). The headline column is AMPLIFICATION =
  * shuffleWrite / input: how many times the data pays the network per
  * scan byte. Linear per-row operators should sit near 0; hash-agg
  * pipelines near the group-summary size; anything ≥ input size means
  * the plan re-shuffles the corpus and will not survive a 100× scale-up.
  *
  * Caveat at test SF: column pruning + dictionary encoding make the
  * input denominator tiny (a pruned 600 k-row column can read < 100 KB),
  * so single-query `amp` values overstate; compare SHUFFLE columns
  * across queries and watch maxTaskSw for skew rather than reading amp
  * as an absolute. Memoized prepare steps (IVF index, bloom index,
  * canonical labels) bill their one-time build to the FIRST query that
  * triggers them in this JVM.
  *
  *   runMain graft.tools.ScaleAudit <sfDir> [q1,q2,...]
  */
object ScaleAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = GraftSession.build(32, "scale-audit")
    val input = new AtomicLong; val sw = new AtomicLong; val sr = new AtomicLong
    val tasks = new AtomicInteger; val stages = new AtomicInteger
    val maxTaskSw = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          val w = m.shuffleWriteMetrics.bytesWritten
          sw.addAndGet(w)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          maxTaskSw.getAndAccumulate(w, math.max(_, _))
          tasks.incrementAndGet()
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    })
    def drain(): Unit = { // listener bus is async; settle before reading
      var prev = -1L
      while (prev != input.get + sw.get + tasks.get) {
        prev = input.get + sw.get + tasks.get; Thread.sleep(200)
      }
    }
    def mb(b: Long): String = f"${b / 1048576.0}%9.1f"
    println(f"${"query"}%-28s ${"inputMB"}%9s ${"shufWrMB"}%9s ${"shufRdMB"}%9s  amp  stages tasks maxTaskSwMB")
    SparkEntry.queries
      .filter { case (n, _) => which.isEmpty || which.contains(n) }
      .foreach { case (name, fn) =>
        try {
          input.set(0); sw.set(0); sr.set(0); tasks.set(0); stages.set(0); maxTaskSw.set(0)
          fn(spark, sfDir).count()
          spark.catalog.clearCache()
          drain()
          val amp = if (input.get > 0) sw.get.toDouble / input.get else 0.0
          println(f"$name%-28s ${mb(input.get)} ${mb(sw.get)} ${mb(sr.get)} $amp%5.2f ${stages.get}%6d ${tasks.get}%5d ${mb(maxTaskSw.get)}")
        } catch {
          case e: Throwable => println(s"$name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
