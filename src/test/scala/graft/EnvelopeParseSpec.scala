package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Envelope
import graft.types.TableCol

/** Line-level envelope parsing (the dynamic-width stream contract). */
class EnvelopeParseSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "envelope-parse-spec")
  import spark.implicits._

  private val cols = Seq(
    TableCol("1", "k", "bigint", nullable = "false", isPk = "true"),
    TableCol("2", "v", "varchar"))

  test("parseLines: backslash-escaped quotes, commas, NULLs round-trip") {
    // the reference dialect is ESCAPE='\\' (pkg/snowsql/sql.go:23) — a
    // literal quote travels as \" inside a quoted field, not ""
    val lines = Seq(
      """"I","t","s","11",1,"a,b \"quoted\""""",
      """"U","t","s","12",2,\N""").toDF("value")
    val got = Envelope.project(Envelope.parseLines(lines, cols.size), cols)
      .select(col("k"), col("v"), col(Envelope.FlagCol), col(Envelope.CommitTsCol))
      .as[(Long, Option[String], String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, Some("""a,b "quoted""""), "I", 11L)))
    assert(got(1) == ((2L, None, "U", 12L)))
  }

  test("project: binary columns decode per dialect (hex default, base64 for bigquery)") {
    // P3 / cmd/core.go:67-73: the same CDC line can carry binary as hex
    // (snowflake/redshift/default) or base64 (bigquery)
    val binCols = cols :+ TableCol("3", "payload", "blob")
    val payload = Array[Byte](0x00, 0x7f, 0xff.toByte)
    val hexLine = Seq(s""""I","t","s","11",1,"v","007fff"""").toDF("value")
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val b64Line = Seq(s""""I","t","s","11",1,"v","$b64"""").toDF("value")
    val gotHex = Envelope.project(Envelope.parseLines(hexLine, binCols.size), binCols)
      .select("payload").as[Array[Byte]].collect().head
    val gotB64 = Envelope.project(Envelope.parseLines(b64Line, binCols.size), binCols, "base64")
      .select("payload").as[Array[Byte]].collect().head
    assert(gotHex.toSeq == payload.toSeq)
    assert(gotB64.toSeq == payload.toSeq)
  }

  test("parseLinesSplit classifies each corruption and passes clean rows through") {
    val lines = Seq(
      ("f1", """"I","t","s","11",1,"good""""), // clean
      ("f1", """"X","t","s","12",2,"bad flag""""), // flag not I/U/D
      ("f2", """"U","t","s","nope",3,"bad ts""""), // unparseable commit-ts
      ("f2", """"I","t","s","13",4,"extra","width","overflow""""), // too many tokens
      ("f2", """"D","t","s","14",5,\N""") // clean with explicit NULL
    ).toDF("_src_path", "value")
    val split = Envelope.parseLinesSplit(lines, cols.size)
    val verdicts = split
      .select(col("value"), col(Envelope.ReasonCol))
      .as[(String, Option[String])].collect().toMap
    assert(verdicts(""""I","t","s","11",1,"good"""").isEmpty)
    assert(verdicts(""""D","t","s","14",5,\N""").isEmpty)
    assert(verdicts(""""X","t","s","12",2,"bad flag"""").contains(Envelope.ReasonBadFlag))
    assert(verdicts(""""U","t","s","nope",3,"bad ts"""").contains(Envelope.ReasonBadCommitTs))
    assert(verdicts(""""I","t","s","13",4,"extra","width","overflow"""")
      .contains(Envelope.ReasonStructural), s"wide row not structural: $verdicts")
    // the passthrough column survives, and clean rows project normally
    val good = Envelope.project(
      split.filter(col(Envelope.ReasonCol).isNull), cols)
    assert(good.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    assert(split.filter(col(Envelope.ReasonCol).isNotNull)
      .select("_src_path").as[String].collect().sorted.toSeq == Seq("f1", "f2", "f2"))
  }

  test("parseFilesSplit: the multiLine repair read classifies corruption and keeps quoted-newline records whole") {
    // a file that routes to the repair path (quoted field embedding a
    // newline) can ALSO carry corrupt rows — the permissive twin must
    // both repair the split record and quarantine the bad ones
    val dir = java.nio.file.Files.createTempDirectory("env-files-split")
    val f = dir.resolve("CDC0001.csv")
    java.nio.file.Files.writeString(f,
      "\"I\",\"t\",\"s\",\"11\",1,\"first\nsecond line of the same record\"\n" +
        "\"X\",\"t\",\"s\",\"12\",2,\"bad flag\"\n" +
        "\"U\",\"t\",\"s\",\"13\",3,\"fine\"\n")
    val split = graft.cdc.Envelope.parseFilesSplit(spark, Seq(f.toString), cols.size)
    val rows = split
      .select(col("_c4"), col(Envelope.ReasonCol))
      .as[(String, Option[String])].collect().toMap
    assert(rows.size == 3, s"three records expected, got $rows")
    assert(rows("1").isEmpty, "the repaired quoted-newline record is clean")
    assert(rows("2").contains(Envelope.ReasonBadFlag))
    assert(rows("3").isEmpty)
    // the embedded newline survived the repair intact
    val v = split.filter(col("_c4") === "1").select("_c5").as[String].collect().head
    assert(v == "first\nsecond line of the same record", s"newline record torn: $v")
    // and the good rows project through the normal typed path
    val good = Envelope.project(split.filter(col(Envelope.ReasonCol).isNull), cols)
    assert(good.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // source attribution for the quarantine record
    assert(split.filter(col(Envelope.ReasonCol).isNotNull)
      .select("_src_path").as[String].collect().head.endsWith("CDC0001.csv"))
  }

  test("quoteUnbalanced flags split halves, not escaped quotes or clean lines") {
    val rows = Seq(
      (""""I","t","s","11",1,"plain"""", false), // balanced
      (""""I","t","s","11",1,"a \"q\" b"""", false), // escaped quotes
      (""""I","t","s","11",1,"ends with \\"""", false), // escaped backslash before closing quote
      (""""I","t","s","11",1,"first half""", true), // opening half of a split record
      ("""second half"""", true), // closing half
      ("middle line no quotes", false)) // interior of a multi-line field
    val got = rows.map(_._1).toDF("value")
      .select(Envelope.quoteUnbalanced(col("value")).as("odd"))
      .as[Boolean].collect().toSeq
    assert(got == rows.map(_._2), s"parity flags: $got vs ${rows.map(_._2)}")
  }

  test("parseFiles re-reads a file with quoted newlines into intact records") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mlcsv")
    val f = dir.resolve("CDC000001.csv")
    java.nio.file.Files.writeString(f,
      "\"I\",\"t\",\"s\",\"11\",1,\"multi\nline value\"\n" +
        "\"U\",\"t\",\"s\",\"12\",2,\"plain\"\n")
    val got = Envelope.project(
      Envelope.parseFiles(spark, Seq(f.toString), cols.size), cols)
      .select(col("k"), col("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "multi\nline value"), (2L, "plain")))
  }

  test("parseLines: a half-row (split quoted newline) fails the batch loudly") {
    // a quoted field containing a newline arrives as two physical lines
    // from the line-oriented source; the tail half parses as a short row
    // with an invalid envelope and must throw, not merge as garbage
    // dangling quote → structurally malformed → FAILFAST throws
    val halfTail = Seq("""ken"""").toDF("value")
    // full-width row with a bogus flag → the raise_error guard
    // (from_csv FAILFAST already rejects short rows, measured above)
    val shortRow = Seq(""""X","t","s","11",1,"garbage"""").toDF("value")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val e1 = intercept[Exception] {
      Envelope.project(Envelope.parseLines(halfTail, cols.size), cols).collect()
    }
    assert(messages(e1).exists(m => m.contains("Malformed") || m.contains("malformed CDC line")),
      s"expected FAILFAST or the guard, got: $e1")
    val e2 = intercept[Exception] {
      Envelope.project(Envelope.parseLines(shortRow, cols.size), cols).collect()
    }
    assert(messages(e2).exists(_.contains("malformed CDC line")),
      s"expected the envelope-validity guard to fire, got: $e2")
  }
}
