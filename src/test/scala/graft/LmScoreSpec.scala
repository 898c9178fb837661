package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Semantics of the bigram-LM cross-entropy score: a document made of
  * bigrams the corpus repeats constantly must cost fewer bits per
  * bigram than one made of bigrams seen nowhere else, and the bigram
  * count is exact. */
class LmScoreSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "lm-score-spec")

  test("predictable text scores fewer bits per bigram than rare text") {
    import spark.implicits._
    // doc 0 repeats the corpus-dominant bigram; docs 2-9 reinforce it;
    // doc 1 is all singleton bigrams
    val docs = (
      Seq((0L, "a b a b a b a b a b"), (1L, "c d e f g h i j k l")) ++
        (2L to 9L).map(i => (i, "a b a b a b"))
      ).toDF("doc_id", "text")
    val out = TextQueries.lmScore(docs)
      .select("doc_id", "n_bigrams", "bits_per_bigram")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0L)._1 == 9, "10 tokens -> 9 bigrams")
    assert(out(1L)._1 == 9)
    assert(out(0L)._2 < out(1L)._2,
      s"repeated bigrams must be cheaper: ${out(0L)._2} vs ${out(1L)._2}")
    assert(out.values.forall(_._2 > 0.0), "smoothed bits are strictly positive")
  }

  test("single-token and empty documents are excluded, not errors") {
    import spark.implicits._
    val docs = Seq((0L, "only"), (1L, ""), (2L, "a b")).toDF("doc_id", "text")
    val ids = TextQueries.lmScore(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L), s"got $ids")
  }
}
