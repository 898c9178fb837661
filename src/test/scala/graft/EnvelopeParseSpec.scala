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
