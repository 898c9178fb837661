package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FakeMediaCodec, FrameNeardupIndex}

/** Randomized equivalence for the frame-neardup index: across random
  * binary payloads (fixed seed) — including exact re-uploads and
  * unrelated content — `matchBatch` must produce exactly the pairs,
  * shared-frame counts, and integer Jaccards of a plain-Scala brute
  * force over the codec contract. The fixed fixtures in
  * `StreamFrameNeardupSpec` pin the trim/outsider scenarios; this pins
  * the arithmetic over the payload space. */
class FrameNeardupPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "frame-neardup-prop-spec")
  import spark.implicits._

  private def fpsOf(c: Array[Byte]): Set[(Long, Int)] = {
    val h = FakeMediaCodec.seed(c)
    val n = FakeMediaCodec.framesOf(h)
    (0 until n by FrameNeardupIndex.FrameStride).map(i => (h % 256, i)).toSet
  }

  test("matchBatch ≡ brute force over random payload sets") {
    val rnd = new scala.util.Random(42)
    def randPayload(): Array[Byte] =
      Array.fill(4 + rnd.nextInt(60))(rnd.nextInt(256).toByte)
    val corpus = (0 until 40).map(i => (100L + i, randPayload()))
    // the new batch: a third fresh, a third exact corpus re-uploads, a
    // third sharing the random space (cid collisions happen by chance
    // at 1/256 per pair — 40×20 pairs ≈ 3 expected)
    val fresh = (0 until 7).map(i => (200L + i, randPayload()))
    val reups = (0 until 7).map(i => (300L + i, corpus(rnd.nextInt(corpus.size))._2))
    val more = (0 until 6).map(i => (400L + i, randPayload()))
    val batch = fresh ++ reups ++ more

    val got = FrameNeardupIndex.matchBatch(
        FrameNeardupIndex.build(corpus.toDF("doc_id", "content")),
        batch.toDF("doc_id", "content"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, n, j) => (a, b) -> ((n, j)) }.toMap

    val cfps = corpus.map { case (id, c) => id -> fpsOf(c) }.toMap
    val bfps = batch.map { case (id, c) => id -> fpsOf(c) }.toMap
    val want = (for {
      (a, fa) <- bfps.toSeq; (b, fb) <- cfps.toSeq
      shared = (fa intersect fb).size.toLong
      if shared >= FrameNeardupIndex.MinShared
    } yield (a, b) -> ((shared, shared * 1000000L / (fa.size + fb.size - shared)))).toMap

    assert(got == want,
      s"index-only=${(got.keySet -- want.keySet).take(3)}, " +
        s"brute-only=${(want.keySet -- got.keySet).take(3)}")
    // exact re-uploads must verify at jaccard 1e6 against their source —
    // except sources too short to clear MinShared (≤ stride frames),
    // which by design produce no pair at all
    reups.foreach { case (id, c) =>
      val hits = got.collect { case ((a, b), (_, j)) if a == id && j == 1000000L => b }
      val sources = corpus.collect {
        case (cid, cc) if fpsOf(cc) == fpsOf(c) &&
          fpsOf(cc).size >= FrameNeardupIndex.MinShared => cid
      }
      assert(sources.toSet.subsetOf(hits.toSet),
        s"re-upload $id missed an exact source: hits=$hits sources=$sources")
    }
    assert(want.size >= 3, s"fixture degenerate: only ${want.size} pairs to check")
  }
}
