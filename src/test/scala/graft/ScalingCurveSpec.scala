package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScalingCurve

/** The scaling-curve gate: exponent math pinned on fixtures, red-list
  * discipline pinned on the COMMITTED per-SF sweeps — every query whose
  * last-decade growth exceeds the ceiling at gate-eligible time must
  * carry a plan-level justification, or this suite fails. */
class ScalingCurveSpec extends AnyFunSuite {

  test("exponent math: linear decade = 1, flat = 0, missing legs = NaN") {
    assert(math.abs(ScalingCurve.exponent(1.0, 10.0) - 1.0) < 1e-9)
    assert(math.abs(ScalingCurve.exponent(2.0, 2.0)) < 1e-9)
    assert(math.abs(ScalingCurve.exponent(1.0, 100.0) - 2.0) < 1e-9)
    assert(ScalingCurve.exponent(0.0, 5.0).isNaN)
    assert(ScalingCurve.exponent(5.0, 0.0).isNaN)
  }

  test("red-list logic: slow superlinear flags; sub-floor jitter and fast queries never do") {
    val rows = ScalingCurve.buildRows(Seq(
      Map("lin" -> 0.1, "bad" -> 0.1, "noisy" -> 0.01, "flat" -> 0.5),
      Map("lin" -> 0.5, "bad" -> 0.2, "noisy" -> 0.02, "flat" -> 0.5),
      Map("lin" -> 5.0, "bad" -> 9.0, "noisy" -> 0.9, "flat" -> 0.6)))
    val byName = rows.map(r => r.name -> r).toMap
    assert(!byName("lin").red, "10x/decade (exp 1.0) is the linear contract, not a defect")
    assert(byName("bad").red, "45x/decade at 9 s must red-list")
    // 45x growth but t(sf0.1)=0.9 s: under the floor, exponents of
    // sub-second timings are sweep jitter, not plan signal
    assert(!byName("noisy").red, "sub-floor queries must never red-list")
    assert(!byName("flat").red)
    assert(byName("flat").expLast < 0.1, "flat time must read exp ~0")
    // a query absent at sf0.1 but present at sf0.01 ERRORED at the top
    // SF — red (the symmetric rule has its own test below)
    val partial = ScalingCurve.buildRows(Seq(
      Map[String, Double](), Map("q" -> 1.0), Map[String, Double]()))
    assert(partial.head.expLast.isNaN && partial.head.red)
    // but a gate-eligible query MISSING its sf0.01 leg (it errored
    // there, so Bench excluded it) must red-list — a NaN exponent must
    // not let a superlinear-or-broken query escape the gate
    val gap = ScalingCurve.buildRows(Seq(
      Map("g" -> 0.1), Map[String, Double](), Map("g" -> 5.0)))
    assert(gap.head.expLast.isNaN && gap.head.red,
      "a gate-eligible row with a missing middle leg must require justification")
  }

  test("a query MISSING its sf0.1 leg while present at a smaller SF red-lists") {
    // the worst failure mode — breaks at the LARGEST SF — is exactly the
    // one a present-t(sf0.1) precondition could never see: Bench excludes
    // the error, the row reads as 'not gate-eligible', and the gate is
    // silently blind to it
    val rows = ScalingCurve.buildRows(Seq(
      Map("dies" -> 0.2, "tiny" -> 0.01, "ok" -> 0.05),
      Map("dies" -> 0.8, "ok" -> 0.3),
      Map("ok" -> 2.0)))
    val byName = rows.map(r => r.name -> r).toMap
    assert(byName("dies").red, "missing sf0.1 leg must red-list, not escape the gate")
    // even a noise-floor query must not vanish silently at the top SF
    assert(byName("tiny").red, "any query that errors at sf0.1 needs a justification")
    assert(!byName("ok").red)
  }

  test("a sub-floor sf0.01 denominator gates on exp_overall, not jittery exp_last") {
    // 0.05 s of sf0.01 jitter under a 2 s sf0.1 time reads exp_last 1.6 —
    // pure noise; the two-decade fit (0.2 -> 2.0 = exp 0.5/decade) is the
    // real growth, and forcing a bogus Justified entry for jitter would
    // erode the discipline the map exists for
    val rows = ScalingCurve.buildRows(Seq(
      Map("jit" -> 0.2, "blow" -> 0.02),
      Map("jit" -> ScalingCurve.MidFloorSec * 0.6, "blow" -> ScalingCurve.MidFloorSec * 0.6),
      Map("jit" -> 2.0, "blow" -> 40.0)))
    val byName = rows.map(r => r.name -> r).toMap
    assert(byName("jit").expLast > ScalingCurve.ExpCeiling, "fixture: the noisy exp_last must exceed the ceiling")
    assert(!byName("jit").red, "a noisy sub-floor denominator must fall back to exp_overall")
    // but the fallback still catches a REAL blowup: 0.02 -> 40 s over two
    // decades is exp_overall 1.65 — superlinear however you fit it
    assert(byName("blow").red, "exp_overall above the ceiling must still red-list")
  }

  test("committed sweeps: every red-listed query carries a plan-level justification") {
    // HARD assert, not assume: the three per-SF maps are committed
    // repo artifacts (bench/timings_sf*.json), so a missing one means
    // the scaling evidence was deleted or the Bench per-SF write
    // regressed — silently skipping would disable the gate (the same
    // reasoning as gate.sh failing on a reworded SURVEY count)
    val maps = ScalingCurve.Sfs.map(ScalingCurve.loadMap)
    assert(maps.forall(_.isDefined),
      s"per-SF sweep artifacts missing or sf-mismatched (${ScalingCurve.Sfs.mkString(", ")}) — " +
        "re-run graft.Bench at each SF and commit bench/timings_sf*.json")
    val rows = ScalingCurve.buildRows(maps.map(_.get))
    val eligible = rows.filter(_.t.last.exists(_ >= ScalingCurve.GateFloorSec))
    assert(eligible.nonEmpty, "no gate-eligible queries — sweep artifacts look empty")
    val steepest = eligible.filterNot(_.expLast.isNaN).sortBy(-_.expLast).take(5)
    steepest.foreach { r =>
      info(f"${r.name}%-32s exp_last ${r.expLast}%6.2f  t(sf0.1) ${r.t.last.getOrElse(0.0)}%6.2f s")
    }
    val unjustified = rows.filter(_.red)
      .filterNot(r => ScalingCurve.Justified.contains(r.name))
    assert(unjustified.isEmpty,
      "superlinear growth without a plan-level justification: " +
        unjustified.map(r => f"${r.name} exp_last=${r.expLast}%.2f").mkString(", "))
  }

  test("median sweeps grade the mid-weight majority, not just the slow tail") {
    // with 3-run medians the growth exponents are readable evidence far
    // below the red-list gate; a regression to single-run sweeps (or a
    // collapse in how many queries clear the overhead floor) would
    // silently shrink the 100x evidence back to the slow tail
    val maps = ScalingCurve.Sfs.map(ScalingCurve.loadMap)
    assume(maps.forall(_.isDefined))
    val runs = ScalingCurve.Sfs.map(ScalingCurve.loadRuns)
    assert(runs.forall(_ >= 3),
      s"per-SF sweeps of record must be >=3-run medians (SPARK_GRAFT_RUNS=3), got $runs")
    val rows = ScalingCurve.buildRows(maps.map(_.get))
    val graded = rows.count(_.graded)
    info(s"exponent-graded: $graded of ${rows.size}")
    assert(graded >= 170,
      s"only $graded of ${rows.size} queries are exponent-graded — sweep discipline regressed")
  }
}
