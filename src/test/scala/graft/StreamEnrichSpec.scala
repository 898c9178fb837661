package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.PathCodec
import graft.streaming.{PipelineConfig, StreamEnrich}
import graft.types.{TableCol, TableDefinition, TableDefJson}

/** Stream-static enrichment over the real TiCDC-layout file stream:
  * typed change rows joined in-flight against a static dimension. */
class StreamEnrichSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "stream-enrich-spec")
  import spark.implicits._

  private val defV100 = TableDefinition(
    schema = "tpch", table = "orders", tableVersion = 100L,
    columns = Seq(
      TableCol("1", "o_orderkey", "bigint", nullable = "false", isPk = "true"),
      TableCol("2", "o_custkey", "bigint"),
      TableCol("3", "o_price", "double")))

  test("change stream enriched with a broadcast static dim, stale rows filtered") {
    val root = Files.createTempDirectory("graft-enrich").toString
    val inc = s"$root/increment"
    val key = PathCodec.DmlPathKey("tpch", "orders", 100L, 0L, "2024-01-01")
    Files.createDirectories(Paths.get(PathCodec.dmlPath(inc, key, 1L)).getParent)
    Files.writeString(
      Paths.get(PathCodec.schemaPath(inc, "tpch", "orders", 100L)),
      TableDefJson.write(defV100))
    // ts 5 is pre-snapshot noise (≤ startTso); custkey 30 has no dim row
    Files.writeString(
      Paths.get(PathCodec.dmlPath(inc, key, 1L)),
      """"I","orders","tpch","5",9,10,90.0
        |"I","orders","tpch","11",1,10,40.5
        |"U","orders","tpch","12",2,20,11.0
        |"I","orders","tpch","13",3,30,7.5
        |""".stripMargin)

    val dim = Seq((10L, "BUILDING"), (20L, "MACHINERY"))
      .toDF("custkey", "segment")
    val cfg = PipelineConfig(
      incrementRoot = inc, schemaName = "tpch", tableName = "orders",
      targetRoot = s"$root/target", checkpointDir = s"$root/ckpt",
      seed = defV100, startTso = 10L)

    val q = StreamEnrich
      .enriched(spark, cfg, dim, streamKey = "o_custkey", dimKey = "custkey")
      .select("o_orderkey", "o_custkey", "segment")
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("enriched")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 10L, "BUILDING"),
      (2L, 20L, "MACHINERY")),
      s"stale row must filter, unmatched custkey must drop (inner join): $got")
  }
}
