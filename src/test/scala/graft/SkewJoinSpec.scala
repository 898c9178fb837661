package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.merge.SkewJoin

/** Salted skew join: result-identical to the plain equi-join, hot keys
  * spread across saltFactor sub-partitions, deterministic placement. */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "skew-join-spec")
  import spark.implicits._

  test("salted join equals the plain join on a skewed corpus") {
    // 10k rows of one hot key + a long tail
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => (i.toLong % 50 + 2, i.toLong)))
      .toDF("k", "payload")
    val small = (1L to 60L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted
    val salted = SkewJoin.saltedEquiJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 10500)
  }

  test("hot-key rows actually spread across salts") {
    val big = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val salts = big
      .withColumn("_salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .select("_salt").distinct().as[Int].collect().toSet
    assert(salts.size >= 6, s"1000 distinct rows should hit most of 8 salts: $salts")
  }

  test("deterministic: two runs place rows identically") {
    val big = (1 to 200).map(i => (i.toLong % 5, i.toLong)).toDF("k", "payload")
    val small = (0L to 4L).map(k => (k, s"d$k")).toDF("k", "name")
    def run() = SkewJoin.saltedEquiJoin(big, small, Seq("k"), 4)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(run() == run())
  }
}
