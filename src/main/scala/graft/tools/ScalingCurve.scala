package graft.tools

import java.nio.file.{Files, Paths}

import graft.Bench

/** The scaling-curve report — the directly measurable form of the
  * "survives a 100× scale-up" claim that shuffle-byte ceilings only
  * approximate: how each query's wall time GROWS across the three
  * committed scale factors.
  *
  * Inputs are the per-SF sweep maps Bench writes
  * (`bench/timings_sf{0.001,0.01,0.1}.json`). The headline number per
  * query is the LAST-DECADE growth exponent
  *
  *   exp_last = log10( t(sf0.1) / t(sf0.01) )
  *
  * because over that decade every driver table grows ~10×
  * (lineitem/orders/events/documents; embeddings grows 4×, which only
  * UNDERSTATES its queries' exponents — conservative), while the first
  * decade is flat for the fixed-size document/embedding tables and
  * would read as noise. exp ≈ 1 is linear scaling, ≈ 0 is
  * overhead-dominated, > [[ExpCeiling]] is superlinear growth that
  * will not survive 100×.
  *
  * Gate discipline (the bench-noise lesson): single-sweep timings
  * carry multi-× noise on SUB-SECOND queries — a 0.2 s → 0.9 s jitter
  * reads as exp 0.65 of pure noise — so the red-list only considers
  * queries with t(sf0.1) ≥ [[GateFloorSec]], where a >
  * 10^1.3 ≈ 20× decade ratio cannot be jitter. Red-listed queries must
  * carry a plan-level justification in [[Justified]] or
  * `ScalingCurveSpec` fails.
  *
  *   runMain graft.tools.ScalingCurve   # writes bench/scaling_report.json
  */
object ScalingCurve {

  val Sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")
  /** Red-list threshold on the last-decade exponent: 10^1.3 ≈ a 20×
    * time ratio for a 10× input ratio. */
  val ExpCeiling = 1.3
  /** Queries faster than this at sf0.1 are overhead/noise-dominated —
    * their exponents are not plan signal. 0.5 s is readable ONLY
    * because the committed sweeps are 3-run medians
    * (`SPARK_GRAFT_RUNS=3`); single-run sweeps carry multi-× noise at
    * this range and needed the old 1 s floor. */
  val GateFloorSec = 0.5
  /** Exponent-GRADED floor: with median sweeps, growth exponents are
    * meaningful evidence (reported, trended) well below the red-list
    * gate — down to where JVM/plan overhead itself dominates. */
  val GradeFloorSec = 0.05
  /** The same jitter discipline applied to the DENOMINATOR: exp_last is
    * only plan signal when t(sf0.01) clears the floor scaled down by
    * the decade (a 0.05 s jitter under a 2 s sf0.1 time reads as a
    * spurious exp > 1.3 — the exact mode the gate floor exists to
    * exclude). Below it, gating falls back to the two-decade
    * exp_overall, whose denominator noise is halved by the longer
    * baseline. */
  val MidFloorSec: Double = GateFloorSec / 10.0

  /** Plan-level justifications for red-listed queries — additions here
    * require the justification to name the superlinear term in the
    * PLAN, never "the sweep was slow today". */
  val Justified: Map[String, String] = Map.empty

  /** exp_last: decade growth exponent, NaN when either leg is missing
    * or non-positive. */
  def exponent(t2: Double, t3: Double): Double =
    if (t2 > 0 && t3 > 0) math.log10(t3 / t2) else Double.NaN

  final case class Row(name: String, t: Seq[Option[Double]],
      expLast: Double, expOverall: Double) {
    /** The exponent the red-list grades on: exp_last when the sf0.01
      * denominator clears [[MidFloorSec]]; the two-decade exp_overall
      * when the middle leg is present but noise-floor-dominated; NaN
      * when the middle leg is MISSING outright (the query ERRORED at
      * sf0.01 — Bench excludes failures — which is alarming regardless
      * of growth). */
    def gateExp: Double =
      if (t(1).exists(_ >= MidFloorSec)) expLast
      else if (t(1).isDefined) expOverall
      else Double.NaN

    /** Red = needs a plan-level justification. Three ways in:
      *  - gate-eligible (t(sf0.1) ≥ [[GateFloorSec]]) and [[gateExp]]
      *    superlinear;
      *  - gate-eligible and gateExp NaN (errored at a smaller SF — a
      *    NaN exponent must not let a broken query escape the gate);
      *  - MISSING the sf0.1 leg while present at any smaller SF: the
      *    worst failure mode (breaks at the LARGEST scale) is exactly
      *    the one a present-t(sf0.1) precondition could never see. */
    def red: Boolean = t.last match {
      case Some(v) if v >= GateFloorSec => gateExp.isNaN || gateExp > ExpCeiling
      case Some(_) => false
      case None => t.init.exists(_.isDefined)
    }

    /** Exponent-graded = this row's growth exponent is readable
      * evidence (slow enough at sf0.1 to clear the overhead floor,
      * both last-decade legs measured) — the report's coverage figure,
      * wider than the red-list gate. */
    def graded: Boolean =
      t.last.exists(_ >= GradeFloorSec) && !expLast.isNaN
  }

  /** Build the per-query curve rows from the three sweep maps (ordered
    * as [[Sfs]]); queries appearing in ANY map are reported. */
  def buildRows(maps: Seq[Map[String, Double]]): Seq[Row] = {
    require(maps.size == 3, s"need 3 SF maps, got ${maps.size}")
    val names = maps.flatMap(_.keys).distinct.sorted
    names.map { n =>
      val t = maps.map(_.get(n))
      val expLast = (t(1), t(2)) match {
        case (Some(a), Some(b)) => exponent(a, b)
        case _ => Double.NaN
      }
      val expOverall = (t(0), t(2)) match {
        case (Some(a), Some(b)) if a > 0 && b > 0 => math.log10(b / a) / 2.0
        case _ => Double.NaN
      }
      Row(n, t, expLast, expOverall)
    }
  }

  /** Load a per-SF sweep map from `bench/timings_<sf>.json`; None when
    * the artifact is absent. */
  def loadMap(sf: String): Option[Map[String, Double]] = {
    val p = Paths.get(s"bench/timings_$sf.json")
    if (!Files.isRegularFile(p)) return None
    val (sfDir, m) = Bench.parseTimings(Files.readString(p))
    // the artifact must actually be the sweep it claims to be
    if (!sfDir.exists(_.endsWith(sf))) return None
    Some(m)
  }

  /** Repeat-run count recorded in a per-SF artifact (1 for pre-median
    * sweeps that predate the field). */
  def loadRuns(sf: String): Int = {
    val p = Paths.get(s"bench/timings_$sf.json")
    if (!Files.isRegularFile(p)) return 1
    """"runs":(\d+)""".r.findFirstMatchIn(Files.readString(p))
      .map(_.group(1).toInt).getOrElse(1)
  }

  private def num(d: Double): String =
    if (d.isNaN) "null" else f"$d%.4f".replace(',', '.')

  def main(args: Array[String]): Unit = {
    val maps = Sfs.map(sf => loadMap(sf).getOrElse {
      System.err.println(s"missing or mismatched bench/timings_$sf.json — " +
        s"run: SPARK_GRAFT_SF_DIR=/root/testdata/$sf sbt 'runMain graft.Bench'")
      sys.exit(2)
    })
    val rows = buildRows(maps)
    val lines = rows.map { r =>
      val ts = Sfs.zip(r.t).map { case (sf, v) =>
        s""""t_$sf":${v.map(_.toString).getOrElse("null")}"""
      }.mkString(",")
      val just = Justified.get(r.name)
        .map(j => s""","justified":"$j"""").getOrElse("")
      s"""  {"q":"${r.name}",$ts,"exp_last":${num(r.expLast)},"exp_overall":${num(r.expOverall)},"gate_exp":${num(r.gateExp)},"red":${r.red}$just}"""
    }
    val red = rows.filter(_.red)
    val graded = rows.count(_.graded)
    val runs = Sfs.map(loadRuns)
    val out = new StringBuilder
    out ++= "{\n"
    out ++= s""" "exp_ceiling":$ExpCeiling,"gate_floor_sec":$GateFloorSec,"mid_floor_sec":$MidFloorSec,"grade_floor_sec":$GradeFloorSec,"runs_per_sf":[${runs.mkString(",")}],"queries":${rows.size},"graded":$graded,"red":${red.size},\n"""
    out ++= " \"rows\":[\n" + lines.mkString(",\n") + "\n ]\n}\n"
    Files.createDirectories(Paths.get("bench"))
    Files.writeString(Paths.get("bench/scaling_report.json"), out.toString)

    val steepest = rows.filter(_.t.last.exists(_ >= GateFloorSec))
      .filterNot(_.expLast.isNaN).sortBy(-_.expLast).take(10)
    println(f"${"query"}%-32s ${"t_sf0.001"}%9s ${"t_sf0.01"}%9s ${"t_sf0.1"}%9s exp_last exp_all")
    steepest.foreach { r =>
      def p(o: Option[Double]) = o.map(v => f"$v%9.2f").getOrElse("        -")
      println(f"${r.name}%-32s ${p(r.t(0))} ${p(r.t(1))} ${p(r.t(2))} ${num(r.expLast)}%8s ${num(r.expOverall)}%7s")
    }
    if (red.nonEmpty) {
      println(s"RED (gate_exp > $ExpCeiling at t >= $GateFloorSec s, or a missing leg): " +
        red.map(r => s"${r.name}=${num(r.gateExp)}").mkString(", "))
      val unjustified = red.filterNot(r => Justified.contains(r.name))
      if (unjustified.nonEmpty) {
        System.err.println("UNJUSTIFIED superlinear queries: " +
          unjustified.map(_.name).mkString(", "))
        sys.exit(1)
      }
    }
    println(s"""{"metric":"scaling_red","value":${red.size},"queries":${rows.size},"graded":$graded,"report":"bench/scaling_report.json"}""")
  }
}
