package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries
import graft.streaming.StreamFertility

// top-level: Spark can't encode a case class nested inside the suite
case class FertDoc(lang: String, text: String)

/** The continuously maintained fertility report: every component is an
  * exact long sum, so merged epoch partials must EQUAL the batch
  * `text_fertility` rows bit-for-bit, and a redelivered epoch must
  * change nothing. */
class StreamFertilitySpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-fertility-spec")
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select("lang", "text").as[FertDoc].collect().toSeq

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("merged epoch partials equal the batch fertility report bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("fert").toString
    val input = MemoryStream[FertDoc]
    val q = StreamFertility.start(input.toDF(), dir)
    try {
      input.addData(docs.take(docs.size / 3))
      q.processAllAvailable()
      input.addData(docs.drop(docs.size / 3))
      q.processAllAvailable()
    } finally q.stop()

    val stream = rows(StreamFertility.report(spark, dir)
      .select("lang", "n_docs", "ws_tokens", "bpe_tokens",
        "fertility_e6", "chars_per_word_e6"))
    val batch = rows(TextQueries.textFertility(spark, sf)
      .select("lang", "n_docs", "ws_tokens", "bpe_tokens",
        "fertility_e6", "chars_per_word_e6"))
    assert(stream == batch)
  }

  test("a redelivered epoch is skipped and changes nothing") {
    val dir = Files.createTempDirectory("fert2").toString
    val slice = docs.take(40).toDF()
    assert(StreamFertility.commitEpoch(slice, dir, 0L))
    val before = StreamFertility.report(spark, dir).collect().toSeq
    assert(!StreamFertility.commitEpoch(slice, dir, 0L), "redelivered epoch landed twice")
    assert(StreamFertility.report(spark, dir).collect().toSeq == before)
  }
}
