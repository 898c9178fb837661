package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DsirQueries, TextQueries}

/** Semantics of the round-5 curation operators: the Gopher/MassiveText
  * rule set, DSIR importance scoring/resampling, and CCNet perplexity
  * bucketing — each driven over hand-built frames where the expected
  * outcome is known by construction. */
class CurationRulesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "curation-rules-spec")

  private val goodText =
    ("the cat sat of mat and dog ran to park with joy " * 5).trim // 60 words, stops present

  test("gopher rules: each rule trips on exactly the doc built to trip it") {
    import spark.implicits._
    val docs = Seq(
      (0L, "en", goodText),                                   // passes all
      (1L, "en", "too short doc"),                            // r_word_count
      (2L, "en", Seq.fill(60)("extraordinarily").mkString(" ")), // r_mean_len (15 chars)
      (3L, "en", Seq.fill(60)("@@!!").mkString(" ")),         // r_symbol + r_alpha + r_stop
      (4L, "en", Seq.fill(60)("cat").mkString(" "))           // r_stop (no stopwords)
    ).toDF("doc_id", "lang", "text")
    val out = TextQueries.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, c: String) = out(id).getBoolean(out(id).fieldIndex(c))
    assert(flag(0L, "pass"), "the well-formed doc must pass every rule")
    assert(!flag(1L, "r_word_count") && flag(1L, "r_mean_len"))
    assert(!flag(2L, "r_mean_len") && flag(2L, "r_word_count"))
    assert(!flag(3L, "r_symbol") && !flag(3L, "r_alpha") && !flag(3L, "r_stop"))
    assert(!flag(4L, "r_stop") && flag(4L, "r_alpha") && !flag(4L, "pass"))
  }

  test("gopher rules: ratio rules are exact-integer comparisons at the boundary") {
    import spark.implicits._
    // 10 words, exactly 8 alphabetic: r_alpha holds at exactly 80 %
    val eight = (Seq.fill(8)("word") ++ Seq.fill(2)("123")).mkString(" ")
    val seven = (Seq.fill(7)("word") ++ Seq.fill(3)("123")).mkString(" ")
    val docs = Seq((0L, "en", eight), (1L, "en", seven)).toDF("doc_id", "lang", "text")
    val out = TextQueries.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("r_alpha"))).toMap
    assert(out(0L), "8/10 alphabetic words is exactly the 80 % floor — passes")
    assert(!out(1L), "7/10 fails the 80 % floor")
  }

  test("dsir: target-language docs outscore off-target docs") {
    import spark.implicits._
    // en docs share a vocabulary; fr docs use disjoint tokens, so the
    // fr buckets are dense in raw but absent from the target model
    val docs = (
      (0L to 19L).map(i => (i, "en", "alpha beta gamma delta epsilon zeta")) ++
      (20L to 39L).map(i => (i, "fr", "un deux trois quatre cinq six"))
    ).toDF("doc_id", "lang", "text")
    val out = DsirQueries.dsirScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("avg_fp"))).toMap
    val en = (0L to 19L).map(out)
    val fr = (20L to 39L).map(out)
    assert(en.min > fr.max,
      s"every en doc must outscore every fr doc: en.min=${en.min} fr.max=${fr.max}")
    assert(en.forall(_ > 0L), "target-like docs have positive log-ratio")
    assert(fr.forall(_ < 0L), "off-target docs have negative log-ratio")
  }

  test("ccnet: within a language, corpus-typical docs land in head, rare in tail") {
    import spark.implicits._
    // 30 docs of the dominant repeated bigram chain, 3 of singletons —
    // the dominant docs are low-perplexity (head/middle), the singleton
    // docs are the most surprising and must land in tail
    val docs = (
      (0L to 29L).map(i => (i, "en", "a b a b a b a b a b")) ++
      Seq((30L, "en", "q w e r t y u i o p"),
          (31L, "en", "z x c v b n m k j h"),
          (32L, "en", "f g d s l r o i u y"))
    ).toDF("doc_id", "lang", "text")
    val out = TextQueries.ccnetBucket(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("bucket"))).toMap
    assert((0L to 29L).forall(i => out(i) != "tail"),
      "dominant-pattern docs are never the worst tercile")
    assert(Seq(30L, 31L, 32L).forall(i => out(i) == "tail"),
      s"singleton-bigram docs land in tail: ${Seq(30L, 31L, 32L).map(out)}")
  }

  test("cluster balance: every cluster keeps at most the cap, ranks contiguous, docs unique") {
    val out = graft.queries.VectorQueries
      .corpusClusterBalance(spark, "/root/testdata/sf0.001")
      .collect()
    val byCluster = out.groupBy(_.getLong(0))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (c, rows) =>
      assert(rows.length <= 10, s"cluster $c kept ${rows.length} > cap")
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.toSeq == (1 to rows.length), s"cluster $c ranks not contiguous: ${ranks.toSeq}")
      val n = rows.head.getLong(1)
      assert(rows.length == math.min(n, 10L).toInt,
        s"cluster $c of size $n must keep min(n, cap) docs, kept ${rows.length}")
    }
    val docs = out.map(_.getLong(3))
    assert(docs.distinct.length == docs.length, "a doc appears in two clusters")
  }

  test("funnel: stages chain (in(i) = out(i-1)), counts monotone, tokens bounded by docs") {
    val rows = graft.queries.CurationQueries
      .corpusFunnel(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getString(0))
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == Seq("0_ingest", "1_gopher_rules",
      "2_lang_quality", "3_exact_dedup", "4_decontaminate"))
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next.getLong(1) == prev.getLong(2),
        s"${next.getString(0)}.docs_in != ${prev.getString(0)}.docs_out")
      assert(next.getLong(2) <= next.getLong(1), s"${next.getString(0)} grew docs")
    }
    assert(rows.head.getLong(1) > 0, "ingest saw no docs")
  }

  test("ccnet: a language absent from the cut sample still buckets (head fallback)") {
    import spark.implicits._
    // one single doc whose doc_id hashes out of the sample can leave its
    // lang cutless — the left-join fallback buckets it head, not dropped
    val docs = (
      (0L to 9L).map(i => (i, "en", "a b a b a b")) ++
      Seq((13L, "xx", "lone doc of lang"))
    ).toDF("doc_id", "lang", "text")
    val out = TextQueries.ccnetBucket(docs)
    assert(out.count() == 11, "no doc with >=2 tokens is ever dropped")
  }
}
