package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** The k-core peel: the fixed-round oracle schedule must be monotone,
  * and the converged production face must satisfy the DEFINING k-core
  * property — every surviving vertex keeps degree ≥ k within the core. */
class KcoreSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "kcore-spec")
  private val sf = "/root/testdata/sf0.001"

  test("peel schedule is monotone nonincreasing in vertices and edges") {
    val rows = GraphQueries.graphKcorePeel(spark, sf)
      .orderBy(col("round"))
      .select(col("vertices").cast("long"), col("edges").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((v1, e1), (v2, e2)) =>
        assert(v2 <= v1, s"vertices grew across a peel round: $v1 -> $v2")
        assert(e2 <= e1, s"edges grew across a peel round: $e1 -> $e2")
      case _ => ()
    }
  }

  test("converged core: every member keeps degree >= k inside the core") {
    val core = GraphQueries.kcoreConverged(spark, sf, k = 3)
    val degs = core.select(col("core_degree").cast("long")).collect().map(_.getLong(0))
    // the fixture graph may legitimately have an empty 3-core; the
    // property only binds when members survive
    assert(degs.forall(_ >= 3L),
      s"a core member has within-core degree < 3: ${degs.filter(_ < 3L).take(5).mkString(", ")}")
    // consistency with the fixed-round schedule: the fixpoint can never
    // hold MORE edges than any point of the peel
    val schedEdges = GraphQueries.graphKcorePeel(spark, sf)
      .agg(min(col("edges"))).head.getLong(0)
    val coreEdges = core.agg(coalesce(sum(col("core_degree")), lit(0L)))
      .head.getLong(0) / 2
    assert(coreEdges <= schedEdges,
      s"converged core has $coreEdges edges, but the schedule bottomed at $schedEdges")
  }
}
