package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.FrameNeardupIndex
import graft.queries.MediaQueries
import graft.streaming.{StreamMediaCurate, StreamShardedExport}

// top-level: Spark can't encode a case class nested inside the suite
case class CaptionedMedia(doc_id: Long, text: String, content: Array[Byte])

/** The composed continuous media-ingest pipeline: CLIP-score alignment
  * gate → corpus frame-near-dup drop → exactly-once sharded landing,
  * with the stream result equal to the directly-curated batch over the
  * same rows. Fixture pairs are MINED (deterministically) for the gate
  * outcomes the scenario needs, since the two-tower scores are
  * hash-derived. */
class StreamMediaCurateSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-media-curate-spec")
  import spark.implicits._

  /** Deterministically mine caption/payload pairs by their clip score:
    * the first `nPass` scoring ≥ threshold and first `nFail` scoring
    * below, via the SAME expressions the gate runs. */
  private lazy val (passing, failing) = {
    val cands = (0 until 400).map(i => (i.toLong, s"caption number $i", s"media payload $i".getBytes("UTF-8")))
    val scored = cands.toDF("doc_id", "text", "content")
      .select(col("doc_id"), call_function("cosine_sim",
        MediaQueries.textEmbedExpr(col("text")),
        MediaQueries.embedExpr(col("content"))).as("s"))
      .as[(Long, Double)].collect().toMap
    val pass = cands.collect { case (id, t, c) if scored(id) >= MediaQueries.ClipThreshold => (id, t, c) }
    val fail = cands.collect { case (id, t, c) if scored(id) < MediaQueries.ClipThreshold => (id, t, c) }
    assert(pass.size >= 2 && fail.nonEmpty, s"mining failed: ${pass.size} pass / ${fail.size} fail")
    (pass.take(2), fail.take(1))
  }

  test("media curation gates by alignment, drops corpus near-dups, lands exactly-once — equal to the batch chain") {
    implicit val sqlCtx = spark.sqlContext
    val Seq(landedPair, freshPair) = passing.toSeq
    val lowPair = failing.head

    // the corpus already holds landedPair's payload → its re-upload must drop
    val index = FrameNeardupIndex.build(
      Seq((900L, landedPair._3)).toDF("doc_id", "content"))

    val rows = Seq(
      CaptionedMedia(1L, landedPair._2, landedPair._3), // aligned but a corpus dup → drop
      CaptionedMedia(2L, freshPair._2, freshPair._3), // aligned and fresh → lands
      CaptionedMedia(3L, lowPair._2, lowPair._3)) // misaligned pair → gate drops

    val direct = StreamMediaCurate.curateBatch(rows.toDF(), neardup = Some(index))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(direct == Set(2L),
      s"want only the aligned fresh upload to survive, got $direct")
    // without the index both aligned pairs survive — the dedup stage is live
    val unGated = StreamMediaCurate.curateBatch(rows.toDF())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(unGated == Set(1L, 2L), s"alignment-only chain diverges: $unGated")

    val out = java.nio.file.Files.createTempDirectory("stream-media-curate").toFile.getAbsolutePath
    val cp = java.nio.file.Files.createTempDirectory("stream-media-curate-cp").toFile.getAbsolutePath
    val input = MemoryStream[CaptionedMedia]
    val q = StreamMediaCurate.start(input.toDF(), out, numShards = 2, checkpoint = cp,
      neardup = Some(index))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val landed = StreamShardedExport.readAll(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == direct, s"stream landing $landed != direct chain $direct")
  }

  test("gate scores equal the oracle-gated mm_clip_filter recipe") {
    // the ingest gate and the batch query must be the same predicate:
    // survivors' clip_score ≥ threshold, drops' < threshold, scores
    // reproduced by an independent projection of the same towers
    val rows = (passing ++ failing).map { case (id, t, c) => CaptionedMedia(id, t, c) }
    val out = StreamMediaCurate.curateBatch(rows.toDF())
      .select("doc_id", "clip_score").as[(Long, Double)].collect().toMap
    assert(out.keySet == passing.map(_._1).toSet, s"gate admitted the wrong set: ${out.keySet}")
    assert(out.values.forall(_ >= MediaQueries.ClipThreshold))
    val recomputed = rows.toDF()
      .select(col("doc_id"), round(call_function("cosine_sim",
        MediaQueries.textEmbedExpr(col("text")),
        MediaQueries.embedExpr(col("content"))), 6).as("s"))
      .as[(Long, Double)].collect().toMap
    out.foreach { case (id, s) => assert(s == recomputed(id), s"score drift for $id") }
  }
}
