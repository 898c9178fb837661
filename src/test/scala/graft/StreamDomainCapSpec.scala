package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries
import graft.streaming.StreamDomainCap
import graft.streaming.StreamDomainCap.{Admitted, Doc}

/** Ingest-time per-domain quota: lifetime cap across epochs, identical
  * to the batch first-K election, deterministic under replay. */
class StreamDomainCapSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-domaincap-spec")
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private val Cap = 5L

  private def run(chunks: Seq[Seq[Doc]]): Seq[Admitted] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"domaincap_${System.nanoTime()}"
    val q = StreamDomainCap.admit(input.toDS(), Cap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[Admitted].collect().toSeq
  }

  test("stream-admitted set ≡ batch first-K per domain, across epoch boundaries") {
    // the SAME synthetic url → canonical → domain chain the batch
    // domain operators use
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), CurationQueries.domainOf(
        CurationQueries.canonicalUrl(CurationQueries.urlOf)).as("domain"))
      .as[(Long, String)].collect().map(p => Doc(p._1, p._2)).sortBy(_.docId)
    // three sequential epochs in doc_id order — stream order IS corpus order
    val third = (docs.length + 2) / 3
    val admitted = run(docs.grouped(third).map(_.toSeq).toSeq)
    val expected = docs.groupBy(_.domain).toSeq.flatMap { case (dom, ds) =>
      ds.sortBy(_.docId).take(Cap.toInt).zipWithIndex
        .map { case (d, i) => Admitted(d.docId, dom, i + 1L) }
    }.toSet
    assert(admitted.toSet == expected,
      s"stream admitted ${admitted.size}, batch expects ${expected.size}")
    assert(admitted.size == expected.size, "duplicate admissions")
  }

  test("the quota is lifetime: a full domain rejects every later epoch's arrivals") {
    val e1 = (1L to Cap).map(i => Doc(i, "d0.example.com"))
    val e2 = Seq(Doc(99L, "d0.example.com"), Doc(100L, "fresh.example.com"))
    val admitted = run(Seq(e1, e2))
    assert(!admitted.exists(_.docId == 99L), "full domain admitted past its cap")
    assert(admitted.exists(_.docId == 100L), "fresh domain was wrongly blocked")
    assert(admitted.count(_.domain == "d0.example.com") == Cap)
  }

  test("within-batch admission is doc_id-ordered — replay admits the identical set") {
    val shuffled = Seq(9L, 1L, 7L, 3L, 5L, 2L, 8L).map(Doc(_, "d1.example.com"))
    val admitted = run(Seq(shuffled)).map(_.docId).toSet
    assert(admitted == Set(1L, 2L, 3L, 5L, 7L),
      s"admission must take the lowest doc_ids, got $admitted")
  }
}
