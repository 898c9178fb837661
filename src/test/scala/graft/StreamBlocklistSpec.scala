package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomAgg
import graft.streaming.StreamBlocklist

/** Streaming blocklist: blocked content drops in-stream via the bloom
  * pre-filter + exact stream-static anti-join; clean content passes;
  * the result equals the batch anti-join over the same rows. */
class StreamBlocklistSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-blocklist-spec")
  import spark.implicits._

  test("blocked fingerprints drop in-stream, exactly as the batch anti-join") {
    implicit val sqlCtx = spark.sqlContext
    val blockedA = "forbidden document body one"
    val blockedB = "another opted-out text"
    val block = Seq(blockedA, blockedB).toDF("text")
      .select(md5(col("text")).as("bfp"))
    val bloomAgg = udaf(new BloomAgg())
    val words = block.select(xxhash64(col("bfp")).as("h"))
      .agg(bloomAgg(col("h"))).head().getSeq[Long](0).toArray

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("fp", md5(col("text")))
    val q = StreamBlocklist.cleanStream(docs, block, words).writeStream
      .format("memory").queryName("stream_blocklist").outputMode("append")
      .start()

    val rows = Seq(
      (1L, "regular content alpha"), (2L, blockedA), (3L, "regular bravo"),
      (4L, blockedB), (5L, "regular charlie"))
    input.addData(rows.take(3))
    q.processAllAvailable()
    input.addData(rows.drop(3)) // second micro-batch: stateless → same rule
    q.processAllAvailable()
    q.stop()

    val got = spark.table("stream_blocklist")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L), s"stream kept $got, want clean docs only")

    // batch reference: the plain anti-join over the same rows
    val batch = rows.toDF("doc_id", "text")
      .withColumn("fp", md5(col("text")))
      .join(block, col("fp") === col("bfp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
  }
}
