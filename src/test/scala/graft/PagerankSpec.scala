package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** The epsilon-terminated PageRank loop — the production face whose
  * round count is data-dependent, so it is spec-gated (the driver's
  * oracle row stays on the fixed-round `graph_pagerank`). */
class PagerankSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "pagerank-spec")

  /** Undirected chain 1–2–…–n as a `(src, dst, deg)` edge frame plus
    * the uniform init and |V| scalar the loop expects. */
  private def chain(n: Int) = {
    import spark.implicits._
    val e = (1 until n).flatMap(i => Seq((i.toLong, (i + 1).toLong), ((i + 1).toLong, i.toLong)))
      .toDF("src", "dst")
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    val edges = e.join(deg, Seq("src"))
    val nF = deg.agg(count(lit(1)).as("n"))
    val init = deg.crossJoin(broadcast(nF))
      .select($"src".as("doc_id"), (lit(1.0d) / $"n".cast("double")).as("pr"))
    (edges, init, nF)
  }

  test("converges on a chain graph: mass conserved, ends symmetric, interior-dominant") {
    val (edges, init, nF) = chain(10)
    val pr = GraphQueries.pagerankLoop(edges, init, nF, eps = 1e-12, maxIters = 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 10)
    // damped PageRank preserves total mass = 1 on a dangling-free graph
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass drifted: ${pr.values.sum}")
    // the chain is symmetric under reversal: node i and node 11-i tie
    (1 to 5).foreach { i =>
      assert(math.abs(pr(i.toLong) - pr((11 - i).toLong)) < 1e-9,
        s"chain symmetry broken at $i: ${pr(i.toLong)} vs ${pr((11 - i).toLong)}")
    }
    // interior nodes outrank the degree-1 endpoints
    assert(pr(5L) > pr(1L), "interior node does not outrank the endpoint")
  }

  test("epsilon loop agrees with the fixed-round oracle query to iteration tolerance") {
    val sf = "/root/testdata/sf0.001"
    val fixed = GraphQueries.graphPagerank(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val conv = GraphQueries.pagerankConverged(spark, sf, eps = 1e-10, maxIters = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(conv.keySet == fixed.keySet)
    // 3 fixed rounds is a coarse approximation of the fixed point: the
    // converged vector must be close (damping 0.85 ⇒ residual ≤ 0.85³)
    fixed.foreach { case (id, p) =>
      assert(math.abs(conv(id) - p) <= 0.7,
        s"converged rank wildly off the fixed-round value at $id: ${conv(id)} vs $p")
    }
    // and strictly normalized
    assert(math.abs(conv.values.sum - 1.0) < 1e-6)
  }

  test("fails loudly when the round budget cannot reach epsilon") {
    val (edges, init, nF) = chain(30)
    val ex = intercept[IllegalArgumentException] {
      GraphQueries.pagerankLoop(edges, init, nF, eps = 1e-300, maxIters = 2)
    }
    assert(ex.getMessage.contains("failed to converge"))
  }
}
