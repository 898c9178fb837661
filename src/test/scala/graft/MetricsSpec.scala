package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ReplicationMetrics, StatusApi}

/** R3/R4 unit coverage: counter registry semantics and the /info-shaped
  * status document (reference `pkg/metrics/metrics_test.go` analog). */
class MetricsSpec extends AnyFunSuite {

  test("counters add/set/get per table label") {
    val m = new ReplicationMetrics
    m.add(m.Names.RowsLoaded, "tpch/orders", 10)
    m.add(m.Names.RowsLoaded, "tpch/orders", 5)
    m.add(m.Names.RowsLoaded, "tpch/lineitem", 1)
    m.set(m.Names.TableVersion, "tpch/orders", 200)
    assert(m.get(m.Names.RowsLoaded, "tpch/orders") == 15)
    assert(m.get(m.Names.RowsLoaded, "tpch/lineitem") == 1)
    assert(m.get(m.Names.TableVersion, "tpch/orders") == 200)
    assert(m.get(m.Names.ErrorCount, "tpch/orders") == 0, "unset counter reads 0")
    assert(m.tables == Seq("tpch/lineitem", "tpch/orders"))
    assert(m.snapshot("tpch/orders") ==
      Map(m.Names.RowsLoaded -> 15L, m.Names.TableVersion -> 200L))
  }

  test("status document renders stages, fatal errors are first-wins") {
    val s = new StatusApi
    s.setStage("orders", s.Stage.LoadingSnapshot)
    s.setStage("orders", s.Stage.LoadingIncremental)
    s.setStage("lineitem", s.Stage.LoadingSnapshot)
    s.setFatalError("lineitem", new RuntimeException("boom \"quoted\""))
    s.setFatalError("lineitem", new RuntimeException("second error ignored"))
    assert(s.stageOf("orders") == "loading_incremental")
    assert(s.statusOf("lineitem") == "fatal_error")
    val json = s.render
    assert(json.contains(""""status": "running""""))
    assert(json.contains(""""lineitem": {"stage": "loading_snapshot", "status": "fatal_error""""))
    assert(json.contains("""boom \"quoted\""""))
    assert(!json.contains("second error ignored"))
    assert(json.startsWith("{") && json.endsWith("}"))
  }
}
