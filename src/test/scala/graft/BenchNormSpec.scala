package graft

import org.scalatest.funsuite.AnyFunSuite

/** The solo-re-measure normalization core: a suspect's raw time on a
  * different box means nothing; time / (median control ratio) does.
  * These pin the pure pieces so the tooling can't silently mis-read
  * its own artifact format. */
class BenchNormSpec extends AnyFunSuite {

  test("boxFactor is the median control ratio; 1.0 with no controls") {
    assert(Bench.boxFactor(Nil) == 1.0)
    assert(Bench.boxFactor(Seq(1.5)) == 1.5)
    // median picks the middle, robust to one outlier control
    assert(Bench.boxFactor(Seq(1.4, 1.5, 9.0)) == 1.5)
    assert(Bench.boxFactor(Seq(9.0, 1.4, 1.5)) == 1.5)
    // even-sized lists average the middle pair — with one control under
    // dispute only two ratios remain, and taking the upper-middle would
    // hand the calibration to whichever control ran slower
    assert(Bench.boxFactor(Seq(1.0, 2.0)) == 1.5)
    assert(Bench.boxFactor(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("parseTimings round-trips the artifact format Bench writes") {
    val txt =
      """{
        | "metric":"total","value":7.7,"unit":"sec","failed":0,"count":2,"sf":"/root/testdata/sf0.1",
        | "queries":{
        |  "q1_pricing":0.421327415,
        |  "cdc_merge_into":1.685109846
        | },
        | "errors":{
        |
        | }
        |}""".stripMargin
    val (sf, m) = Bench.parseTimings(txt)
    assert(sf.contains("/root/testdata/sf0.1"))
    assert(m.get("q1_pricing").contains(0.421327415))
    assert(m.get("cdc_merge_into").contains(1.685109846))
    // header numerics before the queries block must not pollute lookups
    assert(!m.contains("value") && !m.contains("count"))
  }

  test("controls are registered queries and structurally diverse") {
    Bench.Controls.foreach { c =>
      assert(SparkEntry.queries.contains(c), s"control $c is not a registered query")
    }
    assert(Bench.Controls.distinct.size == Bench.Controls.size)
  }
}
