package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BpeQueries

/** Distributed BPE training must equal the textbook sequential
  * algorithm merge-for-merge: same tokenization, same greedy
  * left-to-right merge fold, same (count DESC, a, b) argmax order. */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build(4, "bpe-spec")

  // --- sequential reference (textbook BPE over a word-freq map) -------

  private def refTokenize(texts: Seq[String]): Map[String, Long] =
    texts
      .flatMap(_.toLowerCase.split("[^a-z0-9]+"))
      .filter(w => w.nonEmpty && w.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refMerge(syms: List[String], a: String, b: String): List[String] = {
    val acc = mutable.ListBuffer.empty[String]
    syms.foreach { s =>
      if (acc.nonEmpty && acc.last == a && s == b) {
        acc.remove(acc.size - 1); acc += (a + b)
      } else acc += s
    }
    acc.toList
  }

  private def refTrain(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var ws = words.map { case (w, f) => w.map(_.toString).toList -> f }.toSeq
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && out.size < k) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      ws.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += pair
        ws = ws.map { case (syms, f) => refMerge(syms, pair._1, pair._2) -> f }
      }
    }
    out.toSeq
  }

  private val texts = Seq(
    "the lower letter litter sitter lower",
    "newest widest lowest nicest, the newest!",
    "low low lower lowest new news newest",
    "sit sitting sitter litter fitter 42 low-key",
    "?! -- ...") // tokenizes to NOTHING — must still encode to (0, 0)

  private def docsDf = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("distributed training equals the sequential reference merge-for-merge") {
    val ref = refTrain(refTokenize(texts), 8)
    val got = BpeQueries.trainMerges(docsDf, 8)
    assert(ref.size == 8, s"reference produced ${ref.size} merges")
    assert(got == ref, s"merge lists diverge:\n ref=$ref\n got=$got")
  }

  test("training is deterministic across runs") {
    val a = BpeQueries.trainMerges(docsDf, 5)
    val b = BpeQueries.trainMerges(docsDf, 5)
    assert(a == b)
  }

  test("applying trained merges reproduces the sequential encoder on every word") {
    import spark.implicits._
    val merges = BpeQueries.trainMerges(docsDf, 8)
    val words = refTokenize(texts).keys.toSeq.sorted
    val df = words.toDF("w")
      .selectExpr("w", "transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms")
    val encoded = BpeQueries.applyMerges(df, "syms", merges)
      .selectExpr("w", "syms")
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val ref = merges.foldLeft(w.map(_.toString).toList) {
        case (syms, (a, b)) => refMerge(syms, a, b)
      }
      assert(encoded(w) == ref, s"word '$w' encodes to ${encoded(w)}, reference $ref")
    }
    // merges actually compress: at least one word holds a multi-char symbol
    assert(encoded.values.exists(_.exists(_.length > 1)))
  }

  test("round-1 pair counts match a hand count on the fixture corpus") {
    import spark.implicits._
    // hand-computable micro corpus: "aa ab aa" → words {aa:2, ab:1}
    val docs = Seq((0L, "aa ab aa")).toDF("doc_id", "text")
    val words = refTokenize(Seq("aa ab aa"))
    assert(words == Map("aa" -> 2L, "ab" -> 1L))
    val merges = BpeQueries.trainMerges(docs, 1)
    // (a,a) count 2 beats (a,b) count 1
    assert(merges == Seq(("a", "a")))
  }

  test("corpus encode via the vocab table equals sequential per-occurrence encoding") {
    import spark.implicits._
    val merges = BpeQueries.trainMerges(docsDf, 8)
    val got = BpeQueries.encodeCorpus(docsDf, merges)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // sequential reference: tokenize each doc, encode every occurrence
    val ref = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val toks = ws.map { w =>
        if (w.length < 2) 1L
        else merges.foldLeft(w.map(_.toString).toList) {
          case (syms, (a, b)) => refMerge(syms, a, b)
        }.size.toLong
      }.sum
      i.toLong -> ((ws.length.toLong, toks))
    }.toMap
    assert(got == ref, s"corpus encode diverges:\n ref=$ref\n got=$got")
    // trained merges must compress below the character count somewhere
    val chars = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(_.length.toLong).sum
    }.toMap
    assert(got.exists { case (id, (_, tok)) => tok < chars(id) },
      "no document compressed below its character count")
  }

  test("more merges never increase the encoded token count") {
    import spark.implicits._
    val m8 = BpeQueries.trainMerges(docsDf, 8)
    def total(ms: Seq[(String, String)]): Long =
      BpeQueries.encodeCorpus(docsDf, ms)
        .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    val totals = Seq(total(m8.take(2)), total(m8.take(5)), total(m8))
    assert(totals == totals.sorted.reverse, s"token totals not monotone: $totals")
  }
}
