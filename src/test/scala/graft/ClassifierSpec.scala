package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The weak-supervision quality classifier must actually LEARN: its
  * agreement with the labeling rule has to beat the majority-class
  * baseline, or the trained weights carry no signal and the operator is
  * a complicated constant. (The oracle proves both engines compute the
  * same model; this spec proves the model is worth computing.) */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "classifier-spec")

  private val sfDir = "/root/testdata/sf0.01"

  test("classifier agreement with the rule beats the majority baseline") {
    val rows = TextQueries.textClassifierScore(spark, sfDir).collect()
    assert(rows.length == 500)
    val n = rows.length.toDouble
    val posRate = rows.count(_.getAs[Boolean]("rule_pos")) / n
    val majority = math.max(posRate, 1 - posRate)
    val acc = rows.count(r =>
      r.getAs[Boolean]("rule_pos") == r.getAs[Boolean]("predict_pos")) / n
    assert(acc > majority + 0.05,
      f"accuracy $acc%.3f vs majority baseline $majority%.3f — no learned signal")
    // both classes must actually be predicted (not a constant output)
    val predPos = rows.count(_.getAs[Boolean]("predict_pos"))
    assert(predPos > 0 && predPos < rows.length, s"degenerate predictions: $predPos positive")
  }

  test("scores separate the classes: positive-class mean exceeds negative-class mean") {
    val rows = TextQueries.textClassifierScore(spark, sfDir).collect()
    def mean(p: Boolean) = {
      val xs = rows.filter(_.getAs[Boolean]("rule_pos") == p).map(_.getAs[Double]("score"))
      xs.sum / xs.length
    }
    assert(mean(true) > mean(false),
      s"class-mean scores inverted: pos ${mean(true)} vs neg ${mean(false)}")
  }
}
