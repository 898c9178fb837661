package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamPackAtomic
import graft.streaming.StreamPackAtomic.{Doc, Packed}

/** Continuous atomic packing: the open bin must survive micro-batch
  * boundaries, an oversized doc sits alone in an overfull bin, and the
  * stream's lifetime assignment equals the plain-Scala greedy over the
  * same per-shard doc order. */
class StreamPackAtomicSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-pack-atomic-spec")
  import spark.implicits._

  private val Budget = 100L

  test("open bins carry across micro-batches; stream ≡ greedy; oversized sits alone") {
    implicit val sqlCtx = spark.sqlContext
    // shard 0: 60+30 fill bin 0 to 90; the NEXT batch's 20 must open
    // bin 1 (no split), its 70 then fills bin 1 to 90.
    // shard 1: an oversized 250 sits alone in bin 0 (overfull), the
    // following 40 opens bin 1.
    val batch1 = Seq(Doc(1, 0, 60), Doc(2, 0, 30), Doc(3, 1, 250))
    val batch2 = Seq(Doc(4, 0, 20), Doc(5, 0, 70), Doc(6, 1, 40))

    val input = MemoryStream[Doc]
    val q = StreamPackAtomic.pack(input.toDS(), Budget)
      .writeStream.format("memory").queryName("stream_pack_atomic")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_pack_atomic").as[Packed].collect()
      .map(p => p.docId -> ((p.shard, p.bin))).toMap
    val want = Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 0L)), // 60+30 = 90 ≤ 100
      4L -> ((0L, 1L)), // 90+20 > 100 → new bin, ACROSS the batch boundary
      5L -> ((0L, 1L)), // 20+70 = 90 ≤ 100
      3L -> ((1L, 0L)), // oversized alone, overfull
      6L -> ((1L, 1L))) // after an oversized bin, a fresh one opens
    assert(got == want, s"got $got want $want")

    // and the generic equivalence: replaying ALL docs through the batch
    // greedy (ascending docId per shard — the stream's admission order)
    // reproduces the stream's assignment
    val all = (batch1 ++ batch2).groupBy(_.shard)
    val greedy = all.flatMap { case (sh, rows) =>
      var bin = 0L; var fill = -1L
      rows.sortBy(_.docId).map { d =>
        if (fill < 0) { fill = d.tokens }
        else if (fill + d.tokens <= Budget) { fill += d.tokens }
        else { bin += 1; fill = d.tokens }
        d.docId -> ((sh, bin))
      }
    }
    assert(got == greedy, s"stream $got != greedy $greedy")
  }
}
