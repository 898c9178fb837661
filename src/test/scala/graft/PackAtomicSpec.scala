package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Atomic (doc-never-splits) sequence packing: the streaming
  * secondary-sort implementation must reproduce the plain-Scala greedy
  * first-fit exactly — bins, fills, boundaries — on the real corpus,
  * including the oversized-doc-sits-alone rule. */
class PackAtomicSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "pack-atomic-spec")
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val PackShards = 8
  private val PackBudget = 128

  test("corpus_pack_atomic ≡ plain-Scala greedy first-fit per shard") {
    val got = SparkEntry.queries("corpus_pack_atomic")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (sh, b, n, t, f, l) => (sh, b) -> ((n, t, f, l)) }.toMap

    // reference: the same shard hash + whitespace tokens, greedy in
    // plain Scala over doc_id order
    def shardOf(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("US-ASCII"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h % PackShards
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("t"))
      .as[(Long, Long)].collect()
    val assignedRef: Seq[(Long, Long, Long, Long)] =
      docs.groupBy { case (id, _) => shardOf(id) }.toSeq.flatMap { case (sh, rows) =>
        var bin = 0L; var fill = -1L
        rows.sortBy(_._1).toSeq.map { case (id, t) =>
          if (fill < 0) { fill = t } // first doc of the shard
          else if (fill + t <= PackBudget) { fill += t }
          else { bin += 1; fill = t }
          (sh, bin, id, t)
        }
      }
    val want = assignedRef.groupBy { case (sh, b, _, _) => (sh, b) }.map { case (k, rows) =>
      k -> ((rows.size.toLong, rows.map(_._4).sum, rows.map(_._3).min, rows.map(_._3).max))
    }
    assert(got == want, s"spark-only=${(got.keySet -- want.keySet).take(3)}, " +
      s"scala-only=${(want.keySet -- got.keySet).take(3)}")

    // atomicity: every regular bin fits the budget; any overfull bin
    // holds exactly one (oversized) doc
    got.foreach { case ((sh, b), (n, t, _, _)) =>
      assert(t <= PackBudget || n == 1L,
        s"shard $sh bin $b overfull ($t tokens) with $n docs — a doc was split or misplaced")
    }
    assert(got.nonEmpty)
  }
}
