package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cdc.Envelope
import graft.merge.ChangeApply

/** CDC operator family exercised as deterministic batch queries so the
  * driver's DuckDB oracle can check them (SURVEY §2.3 J1/J2, §2.4 A1,
  * §2.9 M6).
  *
  * The change log is synthesized from the `orders`/`lineitem` parquet so
  * both engines see identical input:
  *   I(all rows, ts=1) ∪ U(key%3=0, price+10, ts=2) ∪ D(key%5=0, ts=3).
  * Keys are unique per (pk, ts) so latest-per-key is well-defined.
  */
object CdcQueries {

  private[graft] def ordersChangeLog(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val base = ord.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val inserts = base
      .withColumn(Envelope.FlagCol, lit(Envelope.Insert))
      .withColumn(Envelope.CommitTsCol, lit(1L))
    val updates = base.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn(Envelope.FlagCol, lit(Envelope.Update))
      .withColumn(Envelope.CommitTsCol, lit(2L))
    val deletes = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn(Envelope.FlagCol, lit(Envelope.Delete))
      .withColumn(Envelope.CommitTsCol, lit(3L))
    inserts.unionByName(updates).unionByName(deletes)
  }

  private val ordersChangeLogSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |       'I' AS tidb2dw_flag, 1 AS tidb2dw_commit_ts FROM orders
      |UNION ALL
      |SELECT o_orderkey, o_custkey, 'U', o_totalprice + 10.0, o_orderdate, o_orderpriority,
      |       'U', 2 FROM orders WHERE o_orderkey % 3 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
      |       'D', 3 FROM orders WHERE o_orderkey % 5 = 0""".stripMargin

  /** A1: latest row image per key across the whole change log. */
  def dedupLatest(spark: SparkSession, sfDir: String): DataFrame =
    ChangeApply.dedupLatestPerKey(ordersChangeLog(spark, sfDir), Seq("o_orderkey"))
      .select(col("o_orderkey"), col(Envelope.FlagCol), col(Envelope.CommitTsCol),
        col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  val dedupLatestSql: String =
    s"""WITH changes AS ($ordersChangeLogSql)
      |SELECT o_orderkey, tidb2dw_flag, tidb2dw_commit_ts, o_totalprice, o_orderstatus
      |FROM changes
      |QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts DESC) = 1
      |ORDER BY o_orderkey""".stripMargin

  /** SCD type-2 dimension history from the change log: every I/U event
    * opens a row version at its commit_ts, closed by the NEXT event on
    * the same key (update or delete), open-ended (`is_current`) when no
    * later event exists. This is the warehouse-side product shape the
    * reference's merge sink collapses away (it keeps only the latest
    * image, `replicate/increment.go` merge path); history tables need
    * the full version chain instead.
    *
    * Scale: one window partitioned by the PRIMARY KEY — per-key
    * cardinality is the key's version count (bounded by churn, not
    * corpus size), and keys hash-partition evenly, so the sort inside
    * each partition is tiny and there is exactly one shuffle. */
  def scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col(Envelope.CommitTsCol))
    ordersChangeLog(spark, sfDir)
      .withColumn("valid_to", lead(col(Envelope.CommitTsCol), 1).over(w))
      .filter(col(Envelope.FlagCol) =!= Envelope.Delete)
      .select(col("o_orderkey"),
        col(Envelope.CommitTsCol).as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, lit(1)).otherwise(lit(0)).as("is_current"),
        col("o_orderstatus"), col("o_totalprice"))
      .orderBy(col("o_orderkey"), col("valid_from"))
  }

  /** The [[scd2]] version chain computed SKEW-SAFELY: the plain chain
    * windows by primary key, so one pathologically hot key (a row
    * updated 10⁸ times) serializes its whole history into a single
    * task's sort. Here the chain runs two-phase (the
    * `merge/SkewJoin.scala` move applied to a window):
    *
    *  1. salt every event by its commit-ts RANGE bucket
    *     (`commit_ts div saltWidth` — range, not hash, so order is
    *     preserved within and ACROSS buckets) and chain locally per
    *     `(key, salt)` — each sort handles at most one bucket's events;
    *  2. stitch bucket boundaries with a window over the PER-BUCKET
    *     first-event aggregate — buckets-per-key rows, a factor
    *     `saltWidth` smaller than the event count — closing each
    *     bucket's open tail version at the next bucket's first ts.
    *
    * Bit-identical to the single-window chain (SCd2SkewSpec proves it on
    * a 10⁵-version hot key); the oracle-gated [[scd2]] keeps the plain
    * form — swap this in when per-key churn outgrows a task. */
  private[graft] def scd2ChainSalted(changes: DataFrame, keyCol: String,
      saltWidth: Long): DataFrame = {
    val ts = Envelope.CommitTsCol
    val salted = changes.withColumn("_salt", expr(s"$ts div $saltWidth"))
    val wLocal = Window.partitionBy(col(keyCol), col("_salt")).orderBy(col(ts))
    val local = salted.withColumn("valid_to", lead(col(ts), 1).over(wLocal))
    val wBuckets = Window.partitionBy(col(keyCol)).orderBy(col("_salt"))
    val nextFirst = salted.groupBy(col(keyCol), col("_salt"))
      .agg(min(col(ts)).as("_bmin"))
      .withColumn("_next_min", lead(col("_bmin"), 1).over(wBuckets))
      .select(col(keyCol), col("_salt"), col("_next_min"))
    local.join(nextFirst, Seq(keyCol, "_salt"), "left")
      .withColumn("valid_to",
        when(col("valid_to").isNull, col("_next_min")).otherwise(col("valid_to")))
      .drop("_salt", "_next_min")
  }

  val scd2Sql: String =
    s"""WITH changes AS ($ordersChangeLogSql),
      |versions AS (
      |  SELECT o_orderkey, tidb2dw_flag, tidb2dw_commit_ts AS valid_from,
      |    lead(tidb2dw_commit_ts) OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts) AS valid_to,
      |    o_orderstatus, o_totalprice
      |  FROM changes)
      |SELECT o_orderkey, valid_from, valid_to,
      |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current,
      |  o_orderstatus, o_totalprice
      |FROM versions WHERE tidb2dw_flag != 'D'
      |ORDER BY o_orderkey, valid_from""".stripMargin

  /** J1/J2 MERGE: target = even-keyed half of orders; batch = full change
    * log. Odd keys arrive as inserts, %3 as updates, %5 as deletes. */
  def mergeInto(spark: SparkSession, sfDir: String): DataFrame = {
    val target = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val merged = ChangeApply.applyChanges(target, ordersChangeLog(spark, sfDir), Seq("o_orderkey"))
    merged.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  val mergeIntoSql: String =
    s"""WITH changes AS ($ordersChangeLogSql),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts DESC) = 1
      |),
      |tgt AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
      |FROM (
      |  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate
      |  FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM latest WHERE tidb2dw_flag <> 'D'
      |) ORDER BY o_orderkey""".stripMargin

  // --- PK-less merge (full-row identity) --------------------------------
  // The reference REJECTS tables without a primary key
  // (`/root/reference/README.md:42-47`); SURVEY §7.4(7) flags the fix:
  // merge on the FULL ROW IMAGE. Semantics are SET semantics on images —
  // the only coherent contract without a key: INSERT lands an image,
  // DELETE removes every copy of one (a keyed warehouse MERGE on
  // all-columns does the same), exact-duplicate source rows collapse to
  // one, and UPDATE events are rejected loudly at the pipeline
  // (an update cannot name the image it replaces — the changefeed must
  // emit delete+insert pairs, which is how row-image logical replication
  // behaves without a replica identity). `TableDefinition.mergeKeys`
  // already falls back to all columns, so the whole merge/bucket
  // machinery runs unchanged: TargetTable buckets by the row-image hash,
  // the anti-join keys on the image, and dedup's (commit_ts, flag)
  // ordering resolves same-ts delete+insert of one image to insert.
  //
  // Scale: identical to the keyed merge — the image hash distributes
  // like any high-cardinality key, so buckets stay balanced and a batch
  // still rewrites only touched buckets.
  def mergePkless(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    def images(df: DataFrame) =
      df.select(col("o_custkey"), col("o_orderpriority")).distinct()
    val target = images(ord.filter(col("o_orderkey") % 2 === 0))
    val inserts = images(ord.filter(col("o_orderkey") % 2 === 1))
      .withColumn(Envelope.FlagCol, lit(Envelope.Insert))
      .withColumn(Envelope.CommitTsCol, lit(1L))
    val deletes = images(ord.filter(col("o_custkey") % 5 === 0))
      .withColumn(Envelope.FlagCol, lit(Envelope.Delete))
      .withColumn(Envelope.CommitTsCol, lit(2L))
    ChangeApply.applyChanges(target, inserts.unionByName(deletes),
        Seq("o_custkey", "o_orderpriority"))
      .orderBy(col("o_custkey"), col("o_orderpriority"))
  }

  val mergePklessSql: String =
    """WITH tgt AS (
      |  SELECT DISTINCT o_custkey, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
      |chg AS (
      |  SELECT DISTINCT o_custkey, o_orderpriority, 'I' AS tidb2dw_flag, 1 AS tidb2dw_commit_ts
      |  FROM orders WHERE o_orderkey % 2 = 1
      |  UNION ALL
      |  SELECT DISTINCT o_custkey, o_orderpriority, 'D', 2
      |  FROM orders WHERE o_custkey % 5 = 0),
      |latest AS (
      |  SELECT * FROM chg
      |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderpriority
      |    ORDER BY tidb2dw_commit_ts DESC, tidb2dw_flag DESC) = 1)
      |SELECT o_custkey, o_orderpriority FROM (
      |  SELECT t.o_custkey, t.o_orderpriority FROM tgt t
      |  WHERE NOT EXISTS (SELECT 1 FROM latest l
      |    WHERE l.o_custkey = t.o_custkey AND l.o_orderpriority = t.o_orderpriority)
      |  UNION ALL
      |  SELECT o_custkey, o_orderpriority FROM latest WHERE tidb2dw_flag <> 'D'
      |) ORDER BY o_custkey, o_orderpriority""".stripMargin

  // --- time-travel (AS OF) read -----------------------------------------
  // Snapshot isolation over the replicated table: reconstruct its state
  // AS OF a commit timestamp by replaying only changes with
  // commit_ts ≤ asOf over the snapshot — the Delta `VERSION AS OF` /
  // TiDB `tidb_snapshot` read, expressed with the SAME applyChanges
  // merge the live path runs (time travel is merge with a bounded
  // change horizon, not a separate engine). AS OF ts=2 sees inserts and
  // updates but NOT the ts=3 deletes — rows the present-time read has
  // already lost. Scale shape: identical to the merge (the commit_ts
  // filter prunes change files before anything shuffles; on the real
  // layout that filter is the date-partitioned CDC path prefix).
  private val AsOfTs = 2L

  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val target = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val horizon = ordersChangeLog(spark, sfDir)
      .filter(col(Envelope.CommitTsCol) <= AsOfTs)
    ChangeApply.applyChanges(target, horizon, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  val timeTravelSql: String =
    s"""WITH changes AS (
      |  SELECT * FROM ($ordersChangeLogSql) WHERE tidb2dw_commit_ts <= $AsOfTs),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts DESC) = 1
      |),
      |tgt AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
      |FROM (
      |  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate
      |  FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM latest WHERE tidb2dw_flag <> 'D'
      |) ORDER BY o_orderkey""".stripMargin

  // --- change-feed generation (inverse of merge) ------------------------
  // Given two table versions, EMIT the row-level I/U/D feed that turns
  // one into the other — how a pipeline backfills CDC from snapshots
  // when no changefeed existed (and the row-level face of
  // `cdc_table_diff`, which localizes drift to buckets but does not
  // name rows). One PK-keyed full outer join; rows present only on the
  // new side emit I, only on the old side D, both sides with any
  // non-PK column changed U (struct inequality — one codegen'd
  // comparison, not per-column joins). Scale shape: the single join is
  // the same PK-partitioned exchange the merge runs; output is
  // changed-rows-sized. Here old = the merge target and new = the
  // merged result, so the feed must reproduce the NET effect of the
  // change log — the oracle certifies diff(apply(log)) ≡ log's net.
  def diffFeed(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val old = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    val newT = ChangeApply.applyChanges(
      Tables.load(spark, sfDir, "orders").filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      ordersChangeLog(spark, sfDir), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
    // presence markers, not column-null proxies — a genuinely-NULL data
    // column must never read as "row absent"
    val o = old.select(col("o_orderkey") +: lit(true).as("in_old") +:
      cols.map(c => col(c).as(s"old_$c")): _*)
    val n = newT.select(col("o_orderkey") +: lit(true).as("in_new") +:
      cols.map(c => col(c).as(s"new_$c")): _*)
    val oldImg = struct(cols.map(c => col(s"old_$c")): _*)
    val newImg = struct(cols.map(c => col(s"new_$c")): _*)
    o.join(n, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        when(col("in_old").isNull && col("in_new").isNotNull, "I")
          .when(col("in_new").isNull, "D")
          .when(!(oldImg === newImg), "U").as("flag"),
        coalesce(col("new_o_custkey"), col("old_o_custkey")).as("o_custkey"),
        coalesce(col("new_o_orderstatus"), col("old_o_orderstatus")).as("o_orderstatus"),
        coalesce(col("new_o_totalprice"), col("old_o_totalprice")).as("o_totalprice"),
        date_format(coalesce(col("new_o_orderdate"), col("old_o_orderdate")), "yyyy-MM-dd")
          .as("o_orderdate"))
      .filter(col("flag").isNotNull)
      .orderBy(col("o_orderkey"))
  }

  val diffFeedSql: String =
    s"""WITH changes AS ($ordersChangeLogSql),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts DESC) = 1
      |),
      |tgt AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |        FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (
      |  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate
      |  FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM latest WHERE tidb2dw_flag <> 'D')
      |SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.o_orderkey IS NULL AND n.o_orderkey IS NOT NULL THEN 'I'
      |       WHEN n.o_orderkey IS NULL THEN 'D'
      |       WHEN (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate)
      |            <> (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate) THEN 'U'
      |       END AS flag,
      |  coalesce(n.o_custkey, o.o_custkey) AS o_custkey,
      |  coalesce(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
      |  coalesce(n.o_totalprice, o.o_totalprice) AS o_totalprice,
      |  strftime(coalesce(n.o_orderdate, o.o_orderdate), '%Y-%m-%d') AS o_orderdate
      |FROM tgt o FULL OUTER JOIN merged n ON o.o_orderkey = n.o_orderkey
      |WHERE (CASE WHEN o.o_orderkey IS NULL AND n.o_orderkey IS NOT NULL THEN 'I'
      |            WHEN n.o_orderkey IS NULL THEN 'D'
      |            WHEN (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate)
      |                 <> (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate) THEN 'U'
      |            END) IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /** Composite-PK merge over lineitem (l_orderkey, l_linenumber) —
    * the multi-column PARTITION BY / merge-ON case
    * (cf. `pkg/snowsql/sql.go:126-133`). */
  def mergeComposite(spark: SparkSession, sfDir: String): DataFrame = {
    // the synthetic lineitem is NOT unique on (orderkey, linenumber);
    // canonicalize so the change log has one image per (pk, commit_ts)
    val li = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(max(col("l_quantity")).as("l_quantity"), max(col("l_returnflag")).as("l_returnflag"))
      .cache() // read 4x below (target + I/U/D legs); uncached the agg reruns each time
    val target = li.filter(col("l_orderkey") % 2 === 0)
    val inserts = li
      .withColumn(Envelope.FlagCol, lit(Envelope.Insert))
      .withColumn(Envelope.CommitTsCol, lit(1L))
    val updates = li.filter((col("l_orderkey") + col("l_linenumber")) % 3 === 0)
      .withColumn("l_quantity", col("l_quantity") + lit(100.0))
      .withColumn(Envelope.FlagCol, lit(Envelope.Update))
      .withColumn(Envelope.CommitTsCol, lit(2L))
    val deletes = li.filter((col("l_orderkey") + col("l_linenumber")) % 7 === 0)
      .withColumn(Envelope.FlagCol, lit(Envelope.Delete))
      .withColumn(Envelope.CommitTsCol, lit(3L))
    val batch = inserts.unionByName(updates).unionByName(deletes)
    ChangeApply.applyChanges(target, batch, Seq("l_orderkey", "l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val mergeCompositeSql: String =
    """WITH li AS (SELECT l_orderkey, l_linenumber, max(l_quantity) AS l_quantity,
      |             max(l_returnflag) AS l_returnflag FROM lineitem GROUP BY 1, 2),
      |changes AS (
      |  SELECT *, 'I' AS tidb2dw_flag, 1 AS tidb2dw_commit_ts FROM li
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_quantity + 100.0, l_returnflag, 'U', 2
      |  FROM li WHERE (l_orderkey + l_linenumber) % 3 = 0
      |  UNION ALL
      |  SELECT *, 'D', 3 FROM li WHERE (l_orderkey + l_linenumber) % 7 = 0
      |),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY tidb2dw_commit_ts DESC) = 1
      |),
      |tgt AS (SELECT * FROM li WHERE l_orderkey % 2 = 0)
      |SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM (
      |  SELECT t.* FROM tgt t WHERE NOT EXISTS (
      |    SELECT 1 FROM latest l WHERE l.l_orderkey = t.l_orderkey AND l.l_linenumber = t.l_linenumber)
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM latest WHERE tidb2dw_flag <> 'D'
      |) ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Incremental view maintenance over the merge path: the per-status
    * COUNT/SUM view of the target is maintained from the change batch's
    * touched rows only (`ViewMaintain.applyDelta` — O(touched keys)),
    * while the ORACLE recomputes the view from the fully merged table —
    * a hash match proves incremental ≡ recompute. The change log's
    * updates move rows across groups (status → 'U') and its deletes can
    * kill groups, so the delta algebra's hard cases are all exercised. */
  def viewMaintain(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.merge.ViewMaintain
    val target = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
    val baseView = ViewMaintain.viewOf(target, "o_orderstatus", "o_totalprice")
    val latest = ChangeApply
      .dedupLatestPerKey(ordersChangeLog(spark, sfDir), Seq("o_orderkey")).cache()
    val oldTouched = target
      .join(latest.select(col("o_orderkey")), Seq("o_orderkey"), "left_semi")
    val newTouched = latest.filter(col(Envelope.FlagCol) =!= Envelope.Delete)
      .select(target.columns.map(col): _*)
    ViewMaintain
      .applyDelta(baseView, oldTouched, newTouched, "o_orderstatus", "o_totalprice")
      .select(col("o_orderstatus"), col("cnt"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("o_orderstatus"))
  }

  val viewMaintainSql: String =
    s"""WITH changes AS ($ordersChangeLogSql),
      |latest AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY tidb2dw_commit_ts DESC) = 1
      |),
      |tgt AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (
      |  SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
      |  FROM tgt t WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.o_orderkey = t.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM latest WHERE tidb2dw_flag <> 'D')
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin

  // --- replication verification: bucket count+checksum table diff -----
  // The sync-diff-inspector shape over a deterministically perturbed
  // copy of `orders`: deleted keys (%997), a drifted column (%1003),
  // and extra keys (%991) — covering the three ways a replica diverges.
  // See merge/TableDiff.scala for the scale argument (one scan + one
  // bounded agg per side; only N_buckets rows join).
  private val DiffBuckets = 16

  private def ordersRepr = concat_ws("|",
    col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
    col("o_totalprice").cast("decimal(18,2)").cast("string"),
    date_format(col("o_orderdate"), "yyyy-MM-dd"), col("o_orderpriority"))

  def tableDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.load(spark, sfDir, "orders")
    val drifted = ord
      .filter(pmod(col("o_orderkey"), lit(997)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(1003)) === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
      .unionByName(ord
        .filter(pmod(col("o_orderkey"), lit(991)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    graft.merge.TableDiff.diff(
      graft.merge.TableDiff.bucketSummary(ord, "o_orderkey", ordersRepr, DiffBuckets),
      graft.merge.TableDiff.bucketSummary(drifted, "o_orderkey", ordersRepr, DiffBuckets))
  }

  private val diffReprSql =
    """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
      |  strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)""".stripMargin

  val tableDiffSql: String =
    s"""WITH dst AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 1003 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 997 != 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 991 = 0),
      |ssum AS (
      |  SELECT o_orderkey % $DiffBuckets AS bucket, count(*) AS n,
      |    sum(CAST(('0x' || substr(md5($diffReprSql), 1, 15)) AS BIGINT)) AS hs
      |  FROM orders GROUP BY 1),
      |dsum AS (
      |  SELECT o_orderkey % $DiffBuckets AS bucket, count(*) AS n,
      |    sum(CAST(('0x' || substr(md5($diffReprSql), 1, 15)) AS BIGINT)) AS hs
      |  FROM dst GROUP BY 1)
      |SELECT coalesce(s.bucket, d.bucket) AS bucket,
      |  CAST(coalesce(s.n, 0) AS BIGINT) AS src_rows,
      |  CAST(coalesce(d.n, 0) AS BIGINT) AS dst_rows,
      |  CAST(CAST(coalesce(s.hs, 0) AS DECIMAL(38,0)) AS VARCHAR) AS src_hsum,
      |  CAST(CAST(coalesce(d.hs, 0) AS DECIMAL(38,0)) AS VARCHAR) AS dst_hsum,
      |  CASE WHEN coalesce(s.n, 0) = coalesce(d.n, 0) AND coalesce(s.hs, 0) = coalesce(d.hs, 0)
      |    THEN 'ok' ELSE 'diff' END AS status
      |FROM ssum s FULL OUTER JOIN dsum d ON s.bucket = d.bucket
      |ORDER BY bucket""".stripMargin

  /** Quarantine-lane accounting (the dead-letter invariant,
    * `rows_landed + rows_quarantined = rows_seen`, hash-gated): orders
    * rows are RENDERED as raw envelope CSV lines, a deterministic
    * subset corrupted (`key % 97` → mangled flag, `key % 101` →
    * unparseable commit-ts), and the lines pushed through the REAL
    * permissive parse ([[Envelope.parseLinesSplit]] — the exact path
    * the streaming pipeline's quarantineDir lane runs). The output is
    * one count per disposition; the oracle predicts the same counts
    * from the corruption predicates alone, so a hash match certifies
    * the parser classified EXACTLY the corrupted subset — no good row
    * quarantined, no corrupt row landed.
    *
    * Scale: render and parse are per-row projections (zero shuffle);
    * the accounting is one hash-agg to ≤ 3 rows. */
  def quarantineAccounting(spark: SparkSession, sfDir: String): DataFrame = {
    val key = col("o_orderkey")
    val line = concat_ws(",",
      when(key % 97 === 0, lit("X")).otherwise(lit(Envelope.Insert)),
      lit("orders"), lit("test"),
      when(key % 101 === 0 && key % 97 =!= 0, lit("not-a-tso")).otherwise(lit("1")),
      key.cast("string"), col("o_custkey").cast("string"),
      col("o_orderstatus"), col("o_totalprice").cast("string"),
      col("o_orderdate").cast("string"), col("o_orderpriority"))
    val lines = Tables.load(spark, sfDir, "orders").select(line.as("value"))
    Envelope.parseLinesSplit(lines, nDataCols = 6)
      .groupBy(coalesce(col(Envelope.ReasonCol), lit("landed")).as("disposition"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("disposition"))
  }

  val quarantineAccountingSql: String =
    """SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'bad_flag'
      |            WHEN o_orderkey % 101 = 0 THEN 'bad_commit_ts'
      |            ELSE 'landed' END AS disposition,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1 ORDER BY disposition""".stripMargin
}
