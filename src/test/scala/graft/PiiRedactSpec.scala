package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PiiRedact

/** PII scrubbing: category coverage, sequential-precedence semantics,
  * and non-PII text passing through untouched. */
class PiiRedactSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "pii-redact-spec")
  import spark.implicits._

  private def run(texts: String*): Seq[(String, Int, Int, Int, Int)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    PiiRedact(df, "text")
      .orderBy("id")
      .select("text", "n_email", "n_ssn", "n_ipv4", "n_phone")
      .as[(String, Int, Int, Int, Int)].collect().toSeq
  }

  test("each category is redacted and counted") {
    val out = run(
      "contact bob.smith+x@example.co.uk for details",
      "ssn 123-45-6789 on file",
      "server at 10.0.255.1 responded",
      "call +1 (415) 555-0199 now")
    assert(out(0) == ("contact [EMAIL] for details", 1, 0, 0, 0))
    // the digit-bounded phone pattern no longer overlaps the 3-2-4 SSN
    // shape, so the raw-text phone count stays zero here
    assert(out(1) == ("ssn [SSN] on file", 0, 1, 0, 0))
    assert(out(2) == ("server at [IPV4] responded", 0, 0, 1, 0))
    assert(out(3) == ("call [PHONE] now", 0, 0, 0, 1))
  }

  test("precedence: ssn/ipv4 redact before the looser phone pattern") {
    // an SSN is also 9 digits with dashes — phone must not eat it
    val out = run("id 123-45-6789 then dial 020 7946 0958 ok")
    assert(out.head._1 == "id [SSN] then dial [PHONE] ok")
    assert(out.head._3 == 1) // n_ssn
    assert(out.head._5 >= 1) // n_phone counts on raw text (may overlap ssn)
  }

  test("multiple hits in one document all redact") {
    val out = run("a@b.io writes to c@d.net from 192.168.0.1 and 172.16.2.9")
    assert(out.head._1 == "[EMAIL] writes to [EMAIL] from [IPV4] and [IPV4]")
    assert(out.head._2 == 2 && out.head._4 == 2)
  }

  test("clean text is untouched with zero counts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pi is 3.14 and e is 2.71", // short dotted numbers are not IPs
      "v1.2.3 release notes") // version strings survive
    val out = run(texts: _*)
    out.zip(texts).foreach { case (got, want) =>
      assert(got == ((want, 0, 0, 0, 0)), s"expected passthrough for: $want")
    }
  }

  test("dates, timestamps, and long numeric ids are NOT phones") {
    // the bounded digit counts (7-15 int'l, 10-11 domestic in 3/3-4/4
    // groups) keep date- and id-shaped digit runs out of [PHONE]
    val texts = Seq(
      "released 2024-01-01 and patched 2024-12-31", // ISO dates
      "at 2024-01-01 10:30 the job ran", // date + clock time
      "epoch 1712345678901 ms", // 13-digit epoch millis
      "tracking 20240101123456 done", // 14-digit contiguous id
      "invoice 12345678 paid") // 8-digit id
    val out = run(texts: _*)
    out.zip(texts).foreach { case (got, want) =>
      assert(got == ((want, 0, 0, 0, 0)), s"expected passthrough for: $want")
    }
  }

  test("bounded phone shapes still redact") {
    val out = run(
      "uk +44 20 7946 0958 ok",
      "us (555) 123-4567 ok",
      "bare 5551234567 ok")
    out.foreach(o => assert(o._1.contains("[PHONE]") && o._5 == 1, o))
  }
}
