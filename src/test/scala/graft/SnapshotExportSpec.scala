package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.snapshot.SnapshotLoader
import graft.streaming.{PipelineConfig, ReplicationJob}
import graft.types.{TableCol, TableDefinition}

/** Export-only mode (reference `cmd/s3.go`/`cmd/gcs.go`): the snapshot
  * dumps as dumpling-layout CSV — chunk naming, schema seed, metadata
  * marker — and round-trips through the typed reader, including
  * hex-encoded binary columns. */
class SnapshotExportSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "export-spec")
  import spark.implicits._

  private val d = TableDefinition(
    schema = "tpch", table = "widgets", tableVersion = 7L,
    columns = Seq(
      TableCol("1", "id", "bigint", nullable = "false", isPk = "true"),
      TableCol("2", "name", "varchar"),
      TableCol("3", "payload", "blob"),
      TableCol("4", "price", "decimal", precision = "10", scale = "2")))

  test("writeSnapshotCsv: dumpling layout + typed round-trip incl. binary") {
    val dir = Files.createTempDirectory("graft-export").toString
    val df = Seq(
      (1L, "plain", Array[Byte](0x00, 0x7f, 0xff.toByte, 0x0a), BigDecimal("12.34")),
      (2L, "quote\"and,comma", Array[Byte](1, 2, 3), BigDecimal("0.99")),
      (3L, null, null, null))
      .toDF("id", "name", "payload", "price")
      .withColumn("price", col("price").cast("decimal(10,2)"))
    val chunks = SnapshotLoader.writeSnapshotCsv(spark, df.repartition(2), dir, d)

    assert(chunks.forall(_.matches("""tpch\.widgets\.\d{9}\.csv""")), chunks.toString)
    assert(Files.exists(Paths.get(dir, "metadata")))
    assert(Files.exists(Paths.get(dir, "tpch.widgets-schema.json")))

    val back = SnapshotLoader.readSnapshotCsv(spark, dir, d)
    assert(back.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val got = back.select("id", "name", "payload", "price")
      .as[(Long, Option[String], Option[Array[Byte]], Option[BigDecimal])]
      .collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(Some("plain"), Some("quote\"and,comma"), None))
    assert(got(0)._3.get.toSeq == Seq[Byte](0x00, 0x7f, 0xff.toByte, 0x0a))
    assert(got(1)._3.get.toSeq == Seq[Byte](1, 2, 3))
    assert(got(2)._3.isEmpty)
    assert(got.map(_._4).toSeq == Seq(Some(BigDecimal("12.34")), Some(BigDecimal("0.99")), None))
  }

  test("writeSnapshotCsv base64 dialect: BigQuery-style dump round-trips") {
    // cmd/core.go:67-73 — bigquery exports binary as base64, everything
    // else hex; the wire text must actually BE base64 and the typed
    // reader must decode it back bit-identically.
    val dir = Files.createTempDirectory("graft-export-b64").toString
    val payload = Array[Byte](0x00, 0x7f, 0xff.toByte, 0x0a)
    val df = Seq((1L, "x", payload, BigDecimal("1.00")))
      .toDF("id", "name", "payload", "price")
      .withColumn("price", col("price").cast("decimal(10,2)"))
    val chunks = SnapshotLoader.writeSnapshotCsv(spark, df, dir, d, binaryDialect = "base64")
    val wire = Files.readString(Paths.get(dir, chunks.head))
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    assert(wire.contains(b64), s"wire CSV should carry base64 '$b64': $wire")
    assert(!wire.contains("007fff0a"), s"wire CSV must not be hex: $wire")
    val got = SnapshotLoader.readSnapshotCsv(spark, dir, d, binaryDialect = "base64")
      .select("payload").as[Array[Byte]].collect()
    assert(got.head.toSeq == payload.toSeq)
  }

  test("ExportOnly run mode writes the dump and finishes without a stream") {
    val root = Files.createTempDirectory("graft-exportmode").toString
    val status = new graft.streaming.StatusApi
    val cfg = PipelineConfig(
      incrementRoot = s"$root/increment", schemaName = "tpch", tableName = "widgets",
      targetRoot = s"$root/target", checkpointDir = s"$root/ckpt", seed = d)
    val q = ReplicationJob.replicateTable(
      spark, Seq((1L, "a", Array[Byte](9), BigDecimal("1.00")))
        .toDF("id", "name", "payload", "price").withColumn("price", col("price").cast("decimal(10,2)")),
      s"$root/snap", cfg, ReplicationJob.ExportOnly, status)
    assert(q.isEmpty, "export mode starts no streaming query")
    assert(status.stageOf("widgets") == "finished")
    assert(SnapshotLoader.readSnapshotCsv(spark, s"$root/snap", d).count() == 1)
    assert(!Files.exists(Paths.get(s"$root/target")), "no target table materialized")
  }
}
