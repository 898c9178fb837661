package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Envelope
import graft.merge.ChangeApply

/** Merge-semantics tests the reference never had (SURVEY §5's must-test
  * list): I/U/D collapse, delete-then-insert in one batch, composite PKs,
  * idempotent replay, and the fold-equivalence property from FIXTURES.md
  * §5 (seeded-random logs; scalatestplus isn't in the offline cache so
  * the property loop is hand-rolled). */
class ChangeApplySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "change-apply-spec")
  import spark.implicits._

  private def changes(rows: (Long, String, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", Envelope.FlagCol, Envelope.CommitTsCol, "v")

  private def target(rows: (Long, String)*): DataFrame = rows.toSeq.toDF("k", "v")

  private def resultSet(df: DataFrame): Set[(Long, String)] =
    df.select("k", "v").as[(Long, String)].collect().toSet

  test("dedup keeps the newest image per key (both implementations)") {
    val batch = changes(
      (1L, "I", 1L, "a"), (1L, "U", 3L, "c"), (1L, "U", 2L, "b"),
      (2L, "I", 1L, "x"), (3L, "D", 9L, "z"))
    for (dedup <- Seq(
        ChangeApply.dedupLatestPerKey(batch, Seq("k")),
        ChangeApply.dedupLatestPerKeyWindow(batch, Seq("k")))) {
      val got = dedup.select("k", Envelope.FlagCol, "v")
        .as[(Long, String, String)].collect().toSet
      assert(got == Set((1L, "U", "c"), (2L, "I", "x"), (3L, "D", "z")))
    }
  }

  test("merge applies I/U/D including delete-then-reinsert in one batch") {
    val t = target((1L, "old1"), (2L, "old2"), (3L, "old3"))
    val batch = changes(
      (2L, "U", 1L, "new2"), // update existing
      (3L, "D", 1L, "old3"), // delete existing
      (4L, "I", 1L, "new4"), // insert new key
      (5L, "I", 1L, "ghost"), (5L, "D", 2L, "ghost"), // insert-then-delete → absent
      (6L, "D", 1L, "x"), (6L, "I", 2L, "revived")) // delete-then-insert → present
    val got = resultSet(ChangeApply.applyChanges(t, batch, Seq("k")))
    assert(got == Set((1L, "old1"), (2L, "new2"), (4L, "new4"), (6L, "revived")))
  }

  test("merge is idempotent per batch (M2/M6 replay invariant)") {
    val t = target((1L, "a"), (2L, "b"))
    val batch = changes((1L, "U", 5L, "a2"), (3L, "I", 5L, "c"), (2L, "D", 5L, "b"))
    val once = ChangeApply.applyChanges(t, batch, Seq("k"))
    val twice = ChangeApply.applyChanges(once, batch, Seq("k"))
    assert(resultSet(once) == resultSet(twice))
  }

  test("composite keys partition correctly") {
    val t = Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k1", "k2", "v")
    val batch = Seq(
      (1L, 1L, "U", 1L, "a2"),
      (2L, 1L, "I", 1L, "c"),
      (1L, 2L, "D", 1L, "b"))
      .toDF("k1", "k2", Envelope.FlagCol, Envelope.CommitTsCol, "v")
    val got = ChangeApply.applyChanges(t, batch, Seq("k1", "k2"))
      .select("k1", "k2", "v").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "a2"), (2L, 1L, "c")))
  }

  /** FIXTURES.md §5: applying the change log ≡ folding it row-by-row. */
  test("property: applyChanges ≡ row-by-row fold of the log") {
    val rnd = new scala.util.Random(42)
    val ops = Seq(Envelope.Insert, Envelope.Update, Envelope.Delete)
    for (trial <- 1 to 15) {
      val log = (0 until (1 + rnd.nextInt(20))).map { i =>
        (rnd.nextInt(7).toLong, ops(rnd.nextInt(3)), i.toLong, s"v${rnd.nextInt(100)}")
      }
      val snapshot = Map(0L -> "s0", 1L -> "s1", 2L -> "s2")
      val expected = log.foldLeft(snapshot) { case (st, (k, op, _, v)) =>
        if (op == Envelope.Delete) st - k else st + (k -> v)
      }
      val t = snapshot.toSeq.toDF("k", "v")
      val batch = log.toDF("k", Envelope.FlagCol, Envelope.CommitTsCol, "v")
      val got = resultSet(ChangeApply.applyChanges(t, batch, Seq("k")))
      assert(got == expected.toSet, s"trial $trial log=$log")
    }
  }

  /** FIXTURES.md §5: one batch ≡ any ordered split of it. */
  test("property: batch-split invariance") {
    val log = Seq(
      (1L, "U", 1L, "a"), (2L, "I", 2L, "b"), (1L, "D", 3L, "x"),
      (3L, "I", 4L, "c"), (1L, "I", 5L, "back"), (2L, "U", 6L, "b2"))
    val t = target((1L, "s1"), (9L, "s9"))
    val whole = resultSet(ChangeApply.applyChanges(t, changes(log: _*), Seq("k")))
    for (split <- 1 until log.size) {
      val (first, second) = log.splitAt(split)
      val afterFirst = ChangeApply.applyChanges(t, changes(first: _*), Seq("k"))
      val afterBoth = resultSet(ChangeApply.applyChanges(afterFirst, changes(second: _*), Seq("k")))
      assert(afterBoth == whole, s"split at $split diverged")
    }
  }
}
