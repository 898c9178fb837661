package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bloom, BloomAgg}
import graft.queries.CurationQueries

/** Bloom filter invariants: build/test probe parity between the Scala
  * aggregator and the Column expression, zero false negatives, a sane
  * false-positive rate at the default sizing, and exactness of the
  * blocklist operator built on top (bloom decides who pays the join,
  * never the answer). */
class BloomSpec extends AnyFunSuite {

  lazy val spark = GraftSession.build(4, "bloom-spec")
  import spark.implicits._

  test("Column probe indices equal the Scala probe indices bit for bit") {
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(200)(rnd.nextLong())
    // build a filter over each hash ALONE via the aggregator, then the
    // Column test over that filter must accept exactly that hash's bits
    val agg = new BloomAgg()
    val all = hashes.foldLeft(agg.zero)(agg.reduce)
    val accepted = hashes.toDF("h")
      .select(Bloom.mayContain(all, col("h")).as("ok"))
      .as[Boolean].collect()
    assert(accepted.forall(identity),
      "an inserted hash tested absent — probe arithmetic diverges between build and test")
  }

  test("mayContainOnce answers equal mayContain on present and absent keys") {
    val rnd = new scala.util.Random(19)
    val inserted = Seq.fill(300)(rnd.nextLong())
    val probes = inserted.take(100) ++ Seq.fill(200)(rnd.nextLong())
    val agg = new BloomAgg()
    val words = inserted.foldLeft(agg.zero)(agg.reduce)
    val both = probes.toDF("h").select(
      Bloom.mayContain(words, col("h")).as("plain"),
      Bloom.mayContainOnce(words, col("h")).as("once"))
      .as[(Boolean, Boolean)].collect()
    assert(both.forall { case (p, o) => p == o },
      "lambda-barrier form diverged from the plain probe")
    assert(both.take(100).forall(_._2), "an inserted key tested absent via Once form")
  }

  test("SQL surface bloom_agg/bloom_contains matches the DataFrame path") {
    val rnd = new scala.util.Random(11)
    val inserted = Seq.fill(300)(rnd.nextLong())
    val probes = inserted.take(50) ++ Seq.fill(50)(rnd.nextLong())
    inserted.toDF("h").createOrReplaceTempView("bloom_keys")
    probes.toDF("h").createOrReplaceTempView("bloom_probes")
    val viaSql = spark.sql(
      """SELECT h, bloom_contains((SELECT bloom_agg(h) FROM bloom_keys), h) AS ok
        |FROM bloom_probes""".stripMargin)
      .as[(Long, Boolean)].collect().toMap
    val agg = new BloomAgg()
    val words = inserted.foldLeft(agg.zero)(agg.reduce)
    val viaDf = probes.toDF("h")
      .select(col("h"), Bloom.mayContain(words, col("h")).as("ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaSql == viaDf, "SQL and DataFrame bloom answers diverge")
    assert(inserted.take(50).forall(viaSql(_)), "an inserted key tested absent via SQL")
  }

  test("no false negatives; false-positive rate sane at default sizing") {
    val rnd = new scala.util.Random(42)
    val present = Seq.fill(2000)(rnd.nextLong()).distinct
    val agg = new BloomAgg()
    val words = present.foldLeft(agg.zero)(agg.reduce)
    val absent = Seq.fill(20000)(rnd.nextLong()).distinct.filterNot(present.contains)
    val fpCount = absent.toDF("h")
      .select(Bloom.mayContain(words, col("h")).as("ok"))
      .as[Boolean].collect().count(identity)
    val rate = fpCount.toDouble / absent.size
    info(f"false-positive rate = $rate%.4f over ${absent.size} absent keys")
    assert(rate < 0.02, s"fp rate $rate too high for 2k keys in 2^17 bits")
  }

  test("merge is bitwise OR: split builds equal the whole build") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(500)(rnd.nextLong())
    val agg = new BloomAgg()
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (a, b) = xs.splitAt(137)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == whole.toSeq, "split-and-merge diverged from the whole build")
  }

  test("corpus_blocklist equals the plain anti-join (bloom is invisible)") {
    val sf = "/root/testdata/sf0.001"
    val got = CurationQueries.corpusBlocklist(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val docs = Tables.load(spark, sf, "documents")
    val block = docs.filter(col("source") === "src0").select(md5(col("text")).as("bfp"))
    val want = docs.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(block, col("fp") === col("bfp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty && want.size < docs.count(),
      "fixture must exercise both kept and dropped documents")
  }
}
