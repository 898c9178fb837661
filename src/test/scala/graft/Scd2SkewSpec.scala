package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CdcQueries
import graft.streaming.StreamScd2

/** SCD2 under pathological churn and disorder.
  *
  * 1. HOT KEY: the plain `cdc_scd2` chain windows by primary key, so one
  *    key updated 10⁵ times serializes into a single task's sort. The
  *    salted two-phase chain (`scd2ChainSalted`) must produce the
  *    IDENTICAL version table while bounding every local sort to one
  *    salt bucket's events — this spec is the equivalence proof the
  *    production swap-in relies on.
  * 2. LATE EVENTS: `StreamScd2.applyBatch` closes a key's open version
  *    at the batch's first event ts; an epoch delivering events BEFORE
  *    that version opened must fail loudly instead of writing an
  *    inverted interval (valid_to < valid_from).
  */
class Scd2SkewSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(8, "scd2-skew-spec")
  import spark.implicits._

  private val HotVersions = 100000L

  /** One hot key with 10⁵ versions, 49 ordinary keys with 3 each, and a
    * sprinkle of deletes — enough disorder to exercise every chain arm. */
  private lazy val skewLog = {
    val hot = spark.range(1L, HotVersions + 1L)
      .select(lit(1L).as("o_orderkey"),
        concat(lit("v"), col("id")).as("o_orderstatus"),
        col("id").cast("double").as("o_totalprice"),
        when(col("id") % 9973 === 0, lit("D")).otherwise(lit("U")).as("tidb2dw_flag"),
        col("id").as("tidb2dw_commit_ts"))
    val cold = spark.range(2L, 51L).select(col("id").as("k"))
      .crossJoin(spark.range(1L, 4L).select(col("id").as("ts")))
      .select(col("k").as("o_orderkey"),
        concat(lit("c"), col("ts")).as("o_orderstatus"),
        (col("k") * 10 + col("ts")).cast("double").as("o_totalprice"),
        when(col("ts") === 3 && col("k") % 5 === 0, lit("D"))
          .otherwise(lit("U")).as("tidb2dw_flag"),
        col("ts").as("tidb2dw_commit_ts"))
    hot.unionByName(cold)
  }

  test("salted two-phase chain equals the single-window chain on a 1e5-version hot key") {
    import org.apache.spark.sql.expressions.Window
    val plain = skewLog
      .withColumn("valid_to", lead(col("tidb2dw_commit_ts"), 1).over(
        Window.partitionBy(col("o_orderkey")).orderBy(col("tidb2dw_commit_ts"))))
      .filter(col("tidb2dw_flag") =!= "D")
      .select(col("o_orderkey"), col("tidb2dw_commit_ts").as("valid_from"),
        col("valid_to"), col("o_orderstatus"), col("o_totalprice"))
    val salted = CdcQueries.scd2ChainSalted(skewLog, "o_orderkey", saltWidth = 1000L)
      .filter(col("tidb2dw_flag") =!= "D")
      .select(col("o_orderkey"), col("tidb2dw_commit_ts").as("valid_from"),
        col("valid_to"), col("o_orderstatus"), col("o_totalprice"))
    // exceptAll both ways = multiset equality, no driver-side 1e5 sort
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted chain diverges from the plain window chain")
    assert(plain.count() == salted.count())
    // the hot key's versions really chain: every non-final valid_to is
    // the next event's ts (spot-check the bucket boundaries, where the
    // stitch join does the work the local window can't)
    val boundary = salted.filter(col("o_orderkey") === 1L &&
      col("valid_from") % 1000 === 0 && col("valid_from") < HotVersions)
    assert(boundary.filter(col("valid_to") =!= col("valid_from") + 1).isEmpty,
      "bucket-boundary versions must close at the next bucket's first ts")
  }

  test("an epoch delivering events before a key's open version fails loudly") {
    val dir = Files.createTempDirectory("scd2late").toString
    val e1 = Seq((7L, "a", 1.0, "I", 10L))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "tidb2dw_flag", "tidb2dw_commit_ts")
    val late = Seq((7L, "b", 2.0, "U", 5L)) // ts 5 < open version's valid_from 10
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "tidb2dw_flag", "tidb2dw_commit_ts")
    assert(StreamScd2.applyBatch(spark, dir, e1, "o_orderkey", 4, 0L))
    val ex = intercept[IllegalArgumentException] {
      StreamScd2.applyBatch(spark, dir, late, "o_orderkey", 4, 1L)
    }
    assert(ex.getMessage.contains("out-of-order"),
      s"guard must name the failure mode: ${ex.getMessage}")
    // the failed epoch must not have corrupted the table
    val h = StreamScd2.history(spark, dir, "o_orderkey")
      .select("valid_from", "valid_to").collect()
    assert(h.length == 1 && h.head.isNullAt(1), "history changed despite the guard")
  }
}
