package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.TableDiff

/** Bucket count+checksum diff: identical tables report every bucket ok;
  * each divergence mode (missing row, drifted value, extra row) flags
  * exactly the buckets it touches; one-sided buckets surface as diff
  * rather than vanishing. */
class TableDiffSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "tablediff-spec")

  private def frame(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private def summary(df: org.apache.spark.sql.DataFrame) =
    TableDiff.bucketSummary(df, "id", concat_ws("|", col("id"), col("v")), 4)

  test("identical tables: every bucket ok, counts intact") {
    val t = frame((0L until 40L).map(i => (i, s"v$i")))
    val out = TableDiff.diff(summary(t), summary(t)).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[String]("status") == "ok"))
    assert(out.map(_.getAs[Long]("src_rows")).sum == 40)
  }

  test("a drifted value flags only its bucket; a missing row flags only its bucket") {
    val src = frame((0L until 40L).map(i => (i, s"v$i")))
    // id=5 (bucket 1) drifts; id=10 (bucket 2) is missing
    val dst = frame((0L until 40L).filter(_ != 10L).map(i =>
      (i, if (i == 5L) "DRIFT" else s"v$i")))
    val out = TableDiff.diff(summary(src), summary(dst)).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[String]("status")).toMap
    assert(out == Map(0 -> "ok", 1 -> "diff", 2 -> "diff", 3 -> "ok"))
  }

  test("a bucket present on only one side reports diff with zeroed counterpart") {
    val src = frame(Seq((0L, "a"), (1L, "b")))
    val dst = frame(Seq((0L, "a")))
    val out = TableDiff.diff(summary(src), summary(dst)).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("dst_rows"), r.getAs[String]("status")))
    assert(out.toSet == Set((0, 1L, "ok"), (1, 0L, "diff")))
  }

  test("diff → repair diverged buckets → re-diff reports all ok") {
    import spark.implicits._
    val src = frame((0L until 100L).map(i => (i, s"v$i")))
    // all three divergence modes: drift (id=5), delete (id=10), extra (id=203)
    val dst = frame((0L until 100L).filter(_ != 10L).map(i =>
      (i, if (i == 5L) "DRIFT" else s"v$i")) :+ (203L, "extra"))
    val d1 = TableDiff.diff(summary(src), summary(dst))
    val bad = TableDiff.divergedBuckets(d1)
    assert(bad.nonEmpty && bad.size < 4, s"expected partial divergence, got $bad")
    val repaired = TableDiff.repair(src, dst, "id", bad, 4)
    val d2 = TableDiff.diff(summary(src), summary(repaired))
    assert(d2.collect().forall(_.getAs[String]("status") == "ok"))
    assert(repaired.count() == 100)
    // intact buckets kept the TARGET's physical rows (no full re-copy)
    val keptIds = repaired.filter(!pmod(col("id"), lit(4)).isin(bad.map(Integer.valueOf): _*))
      .select("id").as[Long].collect().sorted
    val dstKept = dst.filter(!pmod(col("id"), lit(4)).isin(bad.map(Integer.valueOf): _*))
      .select("id").as[Long].collect().sorted
    assert(keptIds.toSeq == dstKept.toSeq)
  }

  test("checksum is order-independent: shuffled rows still compare ok") {
    val src = frame((0L until 20L).map(i => (i, s"v$i")))
    val dst = frame(scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle((0L until 20L).toList).map(i => (i, s"v$i")))
    val out = TableDiff.diff(summary(src), summary(dst)).collect()
    assert(out.forall(_.getAs[String]("status") == "ok"))
  }
}
