package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomAgg
import graft.streaming.{StreamCurate, StreamShardedExport}

/** The composed continuous-ingest pipeline: quality/language gate →
  * blocklist → PII redaction → exactly-once sharded landing, with the
  * stream result equal to the directly-curated batch over the same
  * rows (every stage is the batch code). */
class StreamCurateSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-curate-spec")
  import spark.implicits._

  // normalized fingerprint — the SAME expression scoredDocs produces,
  // so the blocklist keys match the curation chain's fp column
  private def fpOf(text: org.apache.spark.sql.Column) =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  test("stream curation gates, blocks, redacts, and lands exactly-once — equal to the batch chain") {
    implicit val sqlCtx = spark.sqlContext

    val goodText = "the cat sat on the mat and the dog is in the house for fun"
    val germanText = "der und die das ist nicht der und die das war hier"
    val junkText = "zzz zzz zzz zzz zzz"
    val blockedText = "the forbidden text is in the blocklist for a reason"
    val emailText = "please contact the team at bob@example.com for the info and the details"

    val block = Seq(blockedText).toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = block.select(xxhash64(col("bfp")).as("h"))
      .agg(udaf(new BloomAgg()).apply(col("h"))).head().getSeq[Long](0).toArray

    val rows = Seq(
      (1L, goodText), (2L, germanText), (3L, junkText),
      (4L, blockedText), (5L, emailText))

    val out = Files.createTempDirectory("stream-curate").toFile.getAbsolutePath
    val cp = Files.createTempDirectory("stream-curate-cp").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.start(
      input.toDF().toDF("doc_id", "text"), block, words, out, numShards = 2, checkpoint = cp)
    input.addData(rows.take(3))
    q.processAllAvailable()
    input.addData(rows.drop(3)) // stateless chain: later batches, same rules
    q.processAllAvailable()
    q.stop()

    val landed = StreamShardedExport.readAll(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(landed.keySet == Set(1L, 5L),
      s"want the clean English docs only (got ${landed.keySet}): " +
        "german+junk fail the gate, the blocked fp drops")
    assert(landed(5L).contains("[EMAIL]") && !landed(5L).contains("bob@example.com"),
      s"PII must be redacted on the way in: ${landed(5L)}")
    assert(landed(1L) == goodText, "clean text must land unmodified")

    // stream ≡ batch: the direct chain over the same rows
    val direct = StreamCurate.curateBatch(rows.toDF("doc_id", "text"), block, words)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(landed == direct, s"stream $landed != batch $direct")
  }

  test("learned-gate stage composes: rule survivors also pass the trained classifier") {
    // train the gate on the real corpus, then curate a batch with the
    // model in the chain — output must equal rule-gate ∩ classifier-keep,
    // and the stage must actually drop something on a mixed batch
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents")
    val model = graft.queries.TextQueries.trainClassifier(docs)
    val block = Seq.empty[String].toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = new Array[Long](1 << 11) // empty bloom — no blocklist hits
    val batch = docs.select(col("doc_id"), col("text"))

    val withGate = StreamCurate.curateBatch(batch, block, words, model = Some(model))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withoutGate = StreamCurate.curateBatch(batch, block, words)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keep = graft.queries.TextQueries.scoreWithClassifier(batch, model)
      .filter(col("predict_pos")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withGate == (withoutGate intersect keep),
      s"learned gate diverges: ${withGate.size} vs ${(withoutGate intersect keep).size}")
    assert(withGate.size < withoutGate.size,
      "classifier stage dropped nothing on the mixed corpus — not composing")
  }

  test("gopher-gate stage composes: rule survivors also pass the full rule set") {
    // the same shared definitions text_gopher_rules/corpus_funnel
    // report on — output must equal quality-gate ∩ gopher-pass, and
    // the stage must actually drop something on the real corpus
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("lang", lit("en"))
    val block = Seq.empty[String].toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = new Array[Long](1 << 11)
    val batch = docs.select(col("doc_id"), col("lang"), col("text"))

    val withGate = StreamCurate.curateBatch(batch, block, words, gopherGate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withoutGate = StreamCurate.curateBatch(batch, block, words)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pass = graft.queries.TextQueries.gopherRules(batch)
      .filter(col("pass")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withGate == (withoutGate intersect pass),
      s"gopher gate diverges: ${withGate.size} vs ${(withoutGate intersect pass).size}")
    assert(withGate.size < withoutGate.size,
      "gopher stage dropped nothing on the real corpus — not composing")
  }

  test("neardup-gate stage composes: ingest drops docs near-duplicating the landed corpus") {
    import graft.queries.NearDupIndex
    implicit val sqlCtx = spark.sqlContext

    // the proven band-colliding near-pair from StreamNearDupSpec
    val landedText = "the quick brown fox jumps over the lazy dog today"
    val nearCopy = "the quick brown fox jumps over the lazy cat today"
    val freshText = "a completely new document about spark streaming state and windows today"

    val index = NearDupIndex.build(Seq((900L, landedText)).toDF("doc_id", "text"))
    val block = Seq.empty[String].toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = new Array[Long](1 << 11)
    val rows = Seq((1L, nearCopy), (2L, freshText))

    // direct chain: the near-copy drops, the fresh doc survives, and the
    // gated output equals ungated ∖ corpus-matches
    val withGate = StreamCurate.curateBatch(rows.toDF("doc_id", "text"), block, words,
        neardup = Some(index))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withoutGate = StreamCurate.curateBatch(rows.toDF("doc_id", "text"), block, words)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val matched = NearDupIndex.matchBatch(index, rows.toDF("doc_id", "text"))
      .select("new_id").collect().map(_.getLong(0)).toSet
    assert(matched == Set(1L), s"fixture: only the near-copy may match the corpus: $matched")
    assert(withGate == (withoutGate -- matched),
      s"neardup gate diverges: $withGate vs ${withoutGate -- matched}")
    assert(withGate.contains(2L) && !withGate.contains(1L),
      s"near-copy must drop, fresh doc must survive: $withGate")

    // and through the streaming query: same result lands in the shards
    val out = java.nio.file.Files.createTempDirectory("stream-curate-nd").toFile.getAbsolutePath
    val cp = java.nio.file.Files.createTempDirectory("stream-curate-nd-cp").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String)]
    val q = StreamCurate.start(input.toDF().toDF("doc_id", "text"), block, words,
      out, numShards = 2, checkpoint = cp, neardup = Some(index))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val landed = StreamShardedExport.readAll(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed == withGate, s"stream landing $landed != direct chain $withGate")
  }

  test("neardup gate probes POST-redaction text: PII-bearing near-copy of a landed doc still drops") {
    import graft.queries.NearDupIndex
    import graft.functions.PiiRedact

    // the landed corpus is written post-PiiRedact, so the index is built
    // from redacted text (= what a rebuild from the landed shards sees);
    // the incoming near-copy carries raw PII in the redacted span — if
    // the gate probed raw text its shingles around the span would differ
    // from the corpus derivation and the near-dup would slip through
    val rawLanded = "contact me at alice@example.com the quick brown fox jumps over the lazy dog today and tomorrow"
    val rawIncoming = "contact me at alice@example.com the quick brown fox jumps over the lazy cat today and tomorrow"
    val landedRedacted = Seq((900L, rawLanded)).toDF("doc_id", "raw")
      .select(col("doc_id"), PiiRedact.redact(col("raw")).as("text"))
    // fixture sanity: redaction actually fired, so raw and landed shingles differ
    assert(!landedRedacted.collect().head.getString(1).contains("alice@example.com"),
      "fixture: the email must be redacted in the landed text")
    val index = NearDupIndex.build(landedRedacted)
    val block = Seq.empty[String].toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = new Array[Long](1 << 11)

    val gated = StreamCurate.curateBatch(
        Seq((1L, rawIncoming)).toDF("doc_id", "text"), block, words,
        neardup = Some(index))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ungated = StreamCurate.curateBatch(
        Seq((1L, rawIncoming)).toDF("doc_id", "text"), block, words)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ungated.contains(1L),
      s"fixture: the doc must pass the quality gate without the neardup stage: $ungated")
    assert(!gated.contains(1L),
      s"PII-bearing near-copy must drop against the post-redaction index: $gated")
  }

  test("domain-gate stage composes: ingest drops exactly the blocklisted domains") {
    // the ingest-time face of corpus_domain_blocklist: the same
    // synthetic-url → canonical → domain derivation, the same
    // bloom-prefiltered exact gate, applied per micro-batch — output
    // must equal quality-gate ∩ domain-allowed, and the gate must
    // actually drop something on the real corpus
    import graft.queries.CurationQueries
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents")
    val block = Seq.empty[String].toDF("t").select(fpOf(col("t")).as("bfp"))
    val words = new Array[Long](1 << 11)
    val batch = docs.select(col("doc_id"), col("text"))

    // blocked domains: the batch query's own deterministic hash slice
    val allowed = CurationQueries.corpusDomainBlocklist(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val domains = batch.withColumn("domain",
        CurationQueries.domainOf(CurationQueries.canonicalUrl(CurationQueries.urlOf)))
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    val blockedDomains = domains.collect {
      case (id, d) if !allowed.contains(id) => d
    }.toSet
    assert(blockedDomains.nonEmpty, "fixture produced no blocked domains")
    val dblock = blockedDomains.toSeq.toDF("bfp")
    val dwords = dblock.select(xxhash64(col("bfp")).as("h"))
      .agg(udaf(new BloomAgg()).apply(col("h"))).head().getSeq[Long](0).toArray

    val withGate = StreamCurate.curateBatch(batch, block, words,
        domainBlock = Some((dblock, dwords)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withoutGate = StreamCurate.curateBatch(batch, block, words)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withGate == (withoutGate intersect allowed),
      s"domain gate diverges: ${withGate.size} vs ${(withoutGate intersect allowed).size}")
    assert(withGate.size < withoutGate.size,
      "domain stage dropped nothing on the real corpus — not composing")
  }
}
