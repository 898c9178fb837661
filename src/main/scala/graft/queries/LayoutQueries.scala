package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.snapshot.{BloomIndex, DataLayout, DataLayoutN, ShardedExport}

/** Z-order layout rectangle read over the events log — the
  * data-skipping query path ([[graft.snapshot.DataLayout]]).
  *
  * The layout build is a one-time maintenance job (like the IVF index
  * build or the canonical-labels job), so it is memoized per sfDir and
  * the measured query is the PRUNED READ: stats-table consultation,
  * partition-filtered scan of only the intersecting z-buckets, exact
  * residual filter. The oracle is layout-independent — a plain
  * rectangle predicate over the raw table — so the driver hash-match
  * certifies that pruning dropped no qualifying row and invented none.
  */
object LayoutQueries {

  // 2024-01-08T00:00:00Z .. 2024-01-14T23:59:59.999999999Z (ns epochs)
  private val TsLo = 1704672000000000000L
  private val TsHi = 1705276799999999999L
  private val UserLo = 30L
  private val UserHi = 59L

  private val layoutDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) the z-ordered events layout on
    * (ts, user_id); returns its directory. */
  def prepareEventsLayout(spark: SparkSession, sfDir: String): String =
    layoutDirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      DataLayout.writeZOrdered(
        Tables.load(spark, sfDir, "events"), dir, "ts", "user_id")
      dir
    })

  /** One-week × 30-user rectangle over the z-ordered events layout. */
  def layoutZorderRead(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareEventsLayout(spark, sfDir)
    DataLayout.readPruned(spark, dir, "ts", TsLo, TsHi, "user_id", UserLo, UserHi)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
  }

  val layoutZorderReadSql: String =
    s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
      |FROM events
      |WHERE epoch_ns(ts) BETWEEN $TsLo AND $TsHi
      |  AND user_id BETWEEN $UserLo AND $UserHi""".stripMargin

  // --- Bloom-index point lookup over the same layout -------------------
  // event_id is high-cardinality and UNCLUSTERED (the layout z-orders
  // (ts, user_id)), so every bucket's min/max box contains any probed
  // id and stats pruning opens everything — the exact case the
  // per-bucket Bloom index ([[graft.snapshot.BloomIndex]]) exists for.
  // The probe set is a deterministic id predicate so the oracle is the
  // plain predicate over the raw table: the hash match certifies the
  // bloom-pruned read returns exactly the probed rows — skipped buckets
  // hid nothing, false positives leaked nothing.
  private val ProbeMod = 997L

  private val bloomDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) the event_id Bloom index on the layout. */
  def prepareBloomIndex(spark: SparkSession, sfDir: String): String =
    bloomDirs.computeIfAbsent(sfDir, { _ =>
      val dir = prepareEventsLayout(spark, sfDir)
      BloomIndex.build(spark, dir, "event_id")
      dir
    })

  /** Point-lookup of ~N/997 probe ids through the Bloom-pruned read. */
  def layoutBloomLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareBloomIndex(spark, sfDir)
    // production receives the probe list; here it derives from a pure
    // id predicate so the oracle can mirror it
    val probes = Tables.load(spark, sfDir, "events")
      .select(col("event_id")).filter(pmod(col("event_id"), lit(ProbeMod)) === 0)
    BloomIndex.readLookup(spark, dir, "event_id", probes)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val layoutBloomLookupSql: String =
    s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
      |FROM events WHERE event_id % $ProbeMod = 0
      |ORDER BY event_id""".stripMargin

  // --- 3-dimensional z-order box read ----------------------------------
  // [[graft.snapshot.DataLayoutN]] over (ts, user_id, floor(value)):
  // the query constrains ONLY the second and third dimensions (full
  // time range) — the case a 1-D sort cannot prune at all and a 2-D
  // curve only prunes half of. The oracle is the plain box predicate,
  // so the hash match certifies 3-way pruning drops and invents
  // nothing. `value` is non-negative in this data, so long-cast
  // truncation ≡ floor on both engines.
  private val V3UserLo = 30L
  private val V3UserHi = 59L
  private val V3ValLo = 100L
  private val V3ValHi = 240L

  private val layout3Dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per sfDir) the 3-dim z-ordered events layout. */
  def prepareEventsLayout3(spark: SparkSession, sfDir: String): String =
    layout3Dirs.computeIfAbsent(sfDir, { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
      DataLayoutN.writeZOrdered(
        Tables.load(spark, sfDir, "events"), dir, Seq("ts", "user_id", "value"))
      dir
    })

  /** 30-user × value-band box, full time range, over the 3-dim layout. */
  def layoutZorder3Read(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = prepareEventsLayout3(spark, sfDir)
    DataLayoutN.readPruned(spark, dir,
        Map("user_id" -> (V3UserLo, V3UserHi), "value" -> (V3ValLo, V3ValHi)))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val layoutZorder3ReadSql: String =
    s"""SELECT event_id, epoch_ns(ts) AS ts, user_id, event_type, value
      |FROM events
      |WHERE user_id BETWEEN $V3UserLo AND $V3UserHi
      |  AND CAST(floor(value) AS BIGINT) BETWEEN $V3ValLo AND $V3ValHi
      |ORDER BY event_id""".stripMargin

  // --- epoch-seeded training shuffle assignment ------------------------
  // The permutation [[graft.snapshot.ShardedExport.writeEpochShuffle]]
  // lays on disk, emitted as data so the driver can hash-certify it:
  // shard = epochKey % shards, intra-shard order = the key itself. A new
  // epoch is a new permutation; no global sort ever runs (the writer's
  // per-shard `sortWithinPartitions` is a task-local sort).
  private val ShuffleEpoch = 1L
  private val ShuffleShards = 8

  def corpusEpochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val skey = ShardedExport.epochKeyExpr("doc_id", ShuffleEpoch)
    docs.select(col("doc_id"), skey.as("skey"),
        pmod(skey, lit(ShuffleShards)).as("shard"))
      .orderBy(col("shard"), col("skey"), col("doc_id"))
  }

  val corpusEpochShuffleSql: String =
    s"""SELECT doc_id,
      |  CAST(('0x'||substr(md5($ShuffleEpoch||':'||CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) AS skey,
      |  CAST(('0x'||substr(md5($ShuffleEpoch||':'||CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % $ShuffleShards AS shard
      |FROM documents
      |ORDER BY shard, skey, doc_id""".stripMargin
}
