package graft.tools

import graft.{GraftSession, SparkEntry}

/** Throwaway plan-audit harness — prints formatted plans for the
  * headline queries so pushdown/broadcast/codegen can be inspected. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = GraftSession.build(8, "graft-audit")
    SparkEntry.queries
      .filter { case (n, _) => which.isEmpty || which.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
