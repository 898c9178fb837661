package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Envelope
import graft.merge.{ChangeApply, ViewMaintain}

/** Incremental view maintenance must equal recompute-from-scratch after
  * EVERY batch in a sequence — including the delta algebra's hard
  * cases: an update moving a row across groups, a delete killing a
  * group's last row, and an insert creating a brand-new group. */
class ViewMaintainSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "view-maintain-spec")
  import spark.implicits._

  private val G = "grp"
  private val V = "v"

  private def table(rows: Seq[(Long, String, java.math.BigDecimal)]): DataFrame =
    rows.toDF("id", G, V).select(col("id"), col(G), col(V).cast("decimal(18,4)"))

  private def batch(rows: Seq[(Long, String, java.math.BigDecimal, String, Long)]): DataFrame =
    rows.toDF("id", G, V, Envelope.FlagCol, Envelope.CommitTsCol)
      .select(col("id"), col(G), col(V).cast("decimal(18,4)"),
        col(Envelope.FlagCol), col(Envelope.CommitTsCol))

  private def d(x: String) = new java.math.BigDecimal(x)

  private def sortedView(v: DataFrame): Seq[(String, Long, java.math.BigDecimal)] =
    v.select(col(G), col("cnt"), col("sum_value").cast("decimal(38,4)"))
      .as[(String, Long, java.math.BigDecimal)].collect().sortBy(_._1).toSeq

  test("maintained view tracks recompute across batches with group churn") {
    var target = table(Seq(
      (1L, "a", d("10.5")), (2L, "a", d("20.25")), (3L, "b", d("5.0"))))
    var view = ViewMaintain.viewOf(target, G, V)

    val batches = Seq(
      // update 2 moves a→b; insert 4 creates new group c
      batch(Seq(
        (2L, "b", d("20.25"), Envelope.Update, 10L),
        (4L, "c", d("7.75"), Envelope.Insert, 10L))),
      // delete 3 and the just-moved 2 — group b must DIE entirely
      batch(Seq(
        (2L, "b", d("20.25"), Envelope.Delete, 20L),
        (3L, "b", d("5.0"), Envelope.Delete, 20L))),
      // re-insert 2 into a; update 4 in place; delete a key not present
      // (delete-of-absent-key: old side contributes nothing)
      batch(Seq(
        (2L, "a", d("1.0"), Envelope.Insert, 30L),
        (4L, "c", d("8.25"), Envelope.Update, 30L),
        (99L, "z", d("4.0"), Envelope.Delete, 30L))))

    batches.zipWithIndex.foreach { case (b, i) =>
      val latest = ChangeApply.dedupLatestPerKey(b, Seq("id")).cache()
      val oldTouched = target.join(latest.select(col("id")), Seq("id"), "left_semi")
      val newTouched = latest.filter(col(Envelope.FlagCol) =!= Envelope.Delete)
        .select(target.columns.map(col): _*)
      view = ViewMaintain.applyDelta(view, oldTouched, newTouched, G, V)
        .localCheckpoint() // pin each step so the next builds on materialized state
      target = ChangeApply.applyLatest(target, latest, Seq("id")).localCheckpoint()
      assert(sortedView(view) == sortedView(ViewMaintain.viewOf(target, G, V)),
        s"batch $i: maintained view diverged from recompute")
    }
    // final shape sanity: b is gone, a holds {1, 2'}, c holds {4'}
    val fin = sortedView(view)
    assert(fin.map(_._1) == Seq("a", "c"), s"groups: $fin")
    assert(fin == Seq(
      ("a", 2L, d("11.5000")), ("c", 1L, d("8.2500"))), s"final: $fin")
  }
}
